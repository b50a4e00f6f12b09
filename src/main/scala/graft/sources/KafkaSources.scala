package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka source/sink wiring (S1/S4: hot-item-analysis/.../HotItems.scala:
  * 46-54 consumes topic "hotitems" from earliest; File2KafkaUtil.scala:
  * 31-46 replays a file into the topic).
  *
  * Requires the spark-sql-kafka-0-10 connector on the classpath (ships
  * with every Spark distribution's external jars; not present in this
  * offline container). End-to-end evidence: `graft.KafkaE2ESpec` runs
  * file→Kafka→consume→hot-items against a live broker and is gated —
  * cancels with a bootstrap pointer when connector jars or a broker are
  * absent; docs/kafka-bootstrap.md has the exact jar coordinates and
  * broker recipe. The rest of the pipeline is source-agnostic and
  * tested via file/memory/rate sources either way.
  */
object KafkaSources {

  /** CSV-lines-over-Kafka stream, the reference's ingestion shape:
    * value bytes → string line, to be parsed by ReferenceSources
    * schemas via from_csv.
    */
  def readCsvLines(spark: SparkSession, servers: String, topic: String,
                   startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("line"))

  /** Parse the Kafka line stream with one of the reference schemas. */
  def parseLines(lines: DataFrame, schema: StructType): DataFrame =
    lines.select(from_csv(col("line"),
        schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))

  /** S4: replay a text file into a topic (File2KafkaUtil parity). */
  def fileToKafka(spark: SparkSession, path: String, servers: String,
                  topic: String): Unit =
    spark.read.text(path)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()

  /** Streaming sink: write a single string column `value` to a topic. */
  def writeStream(df: DataFrame, servers: String, topic: String,
                  checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
