package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2 — live HTTP extract (ref: etl/extract.py:8-34 `retrieve_data` /
  * `retrieve_player_details`, driven by etl/run_extract.py:54-62: one
  * bulk "static" call, one "fixtures" call, then a ~600-way per-player
  * fan-out; results land as JSON files that the transform reads).
  *
  * The fetch sits behind [[HttpFetcher]] so tests run against an in-JVM
  * fake endpoint (this environment has no egress) and production supplies
  * the same JDK client against the real API.
  *
  * Scale notes: the bulk calls are driver-side (two RPCs). The per-key
  * fan-out runs on EXECUTORS via mapPartitions — one HTTP client per
  * partition, keys distributed — so a 600-call (or 600k-call) fan-out
  * parallelizes with the cluster instead of serializing on the driver
  * like the reference's Python loop. Landing stays byte-exact (K1): raw
  * response text, no re-encode.
  */
trait HttpFetcher extends Serializable {
  /** GET `url` → body text; non-2xx must raise (ref raise_for_status). */
  def get(url: String): String
}

/** JDK java.net.http implementation (public JDK API, no extra deps). */
class JdkHttpFetcher(timeoutMs: Long = 30000) extends HttpFetcher {
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def get(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }
}

object HttpExtract {

  /** S1 — one bulk endpoint (ref retrieve_data). */
  def retrieveData(fetcher: HttpFetcher, url: String): String = fetcher.get(url)

  /** Splice the fan-out key into a fetched JSON object (the ref tags each
    * element-summary doc with its player id). Handles the empty-object
    * response `{}` / `{ }` — naive `{"player_id":N,` + tail would emit a
    * trailing comma and corrupt the landing. */
  private[sources] def spliceId(id: Long, body: String): String = {
    val b = body.trim
    require(b.startsWith("{") && b.endsWith("}"),
      s"expected JSON object for id $id")
    if (b.tail.trim == "}") s"""{"player_id":$id}"""
    else s"""{"player_id":$id,${b.tail}"""
  }

  /** S2 — distributed per-key fan-out (ref retrieve_player_details): fetch
    * `urlTemplate.format(id)` for every id on the executors, splice the id
    * into each JSON object, and assemble the array-of-docs landing form
    * the transform's `playersRaw` schema reads. Results come back sorted
    * by id so the landing file is deterministic.
    *
    * DRIVER-ASSEMBLED: collects every doc and builds one string — the
    * reference's landing shape, right at its ~600-player scale. For a
    * fan-out over millions of keys use [[retrievePlayerDetailsJsonl]],
    * which never moves the docs through the driver. */
  def retrievePlayerDetails(spark: SparkSession, fetcher: HttpFetcher,
      urlTemplate: String, playerIds: Seq[Long],
      partitions: Int = 8): String = {
    val docs = spark.sparkContext
      .parallelize(playerIds, math.min(partitions, math.max(1, playerIds.size)))
      .map(id => id -> spliceId(id, fetcher.get(urlTemplate.format(id))))
      .collect()
      .sortBy(_._1)
    docs.map(_._2).mkString("[\n", ",\n", "\n]")
  }

  /** S2 at scale — the same fan-out landing as PARTITIONED JSONL, written
    * from the EXECUTORS: ids are sorted and range-partitioned, each task
    * opens one HTTP client, fetches its slice and writes one
    * `part-*.txt` of line-delimited docs — the driver never holds a doc.
    * Deterministic modulo partition count: sorted ids → stable slice per
    * part file; every line is self-keyed (`player_id` spliced in), and
    * readers get deterministic order by sorting on it
    * ([[Sources.jsonl]] + orderBy, as FplTransform's tables all do).
    * Returns the landing directory. */
  def retrievePlayerDetailsJsonl(spark: SparkSession, fetcher: HttpFetcher,
      urlTemplate: String, playerIds: Seq[Long], outDir: String,
      partitions: Int = 8): String = {
    val rdd = spark.sparkContext
      .parallelize(playerIds.sorted,
        math.min(partitions, math.max(1, playerIds.size)))
      // one line per doc: raw CR/LF in a JSON body is always inter-token
      // whitespace (unescaped newlines are illegal inside JSON strings),
      // so flattening to spaces is lossless
      .map(id => spliceId(id, fetcher.get(urlTemplate.format(id)))
        .replaceAll("[\n\r]", " "))
    spark.createDataset(rdd)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(outDir)
    outDir
  }

  /** K1 — byte-exact landing save (ref save_intermediate_data). */
  def saveIntermediate(text: String, name: String, dir: String): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, s"$name.json")
    Files.writeString(p, text)
    p.toString
  }

  /** Element ids from the landed main/static JSON (ref: main_data
    * ['elements'][i]['id'] drives the fan-out). Parsed by Spark with the
    * explicit raw schema — no driver-side JSON library. */
  def elementIds(spark: SparkSession, mainJsonPath: String,
      schema: org.apache.spark.sql.types.StructType): Seq[Long] = {
    Sources.json(spark, mainJsonPath, schema)
      .select(explode(col("elements.id")).as("id"))
      .orderBy(col("id"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** The reference's full extract run (run_extract.py main): static +
    * fixtures bulk calls, per-player fan-out, three landing files.
    * Returns the landing paths (main, fixtures, players). */
  def extractAll(spark: SparkSession, fetcher: HttpFetcher,
      staticUrl: String, fixturesUrl: String, playerUrlTemplate: String,
      landingDir: String,
      mainSchema: org.apache.spark.sql.types.StructType): (String, String, String) = {
    val mainPath = saveIntermediate(retrieveData(fetcher, staticUrl), "main", landingDir)
    val fixturesPath =
      saveIntermediate(retrieveData(fetcher, fixturesUrl), "fixtures", landingDir)
    val ids = elementIds(spark, mainPath, mainSchema)
    val playersPath = saveIntermediate(
      retrievePlayerDetails(spark, fetcher, playerUrlTemplate, ids),
      "players", landingDir)
    (mainPath, fixturesPath, playersPath)
  }
}
