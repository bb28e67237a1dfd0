package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Debezium
import graft.streaming.{AggView, ChangelogStream, UpsertSink}

/** Debezium-envelope source adapter: the public CDC wire format decodes
  * into the canonical changelog and drives the full pipeline
  * (decode → expandUpdates → UpsertSink/AggView) from a file-sourced
  * stream — no broker needed — exactly-once across a query restart. */
class DebeziumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def env(op: String, before: Option[(Long, Double)],
                  after: Option[(Long, Double)], file: String, pos: Long,
                  wrapped: Boolean = false): String = {
    def row(r: Option[(Long, Double)]) =
      r.map { case (i, v) => s"""{"id":$i,"value":$v}""" }.getOrElse("null")
    val src = s"""{"name":"srv1","db":"shop","table":"orders",""" +
      s""""file":"$file","pos":$pos,"gtid":"8f9d:17","ts_ms":1}"""
    val payload = s"""{"before":${row(before)},"after":${row(after)},""" +
      s""""source":$src,"op":"$op","ts_ms":1,"transaction":null}"""
    if (wrapped) s"""{"schema":{"type":"struct"},"payload":$payload}""" else payload
  }

  test("decode handles wrapped and flat envelopes; DLQ catches non-envelopes") {
    val raw = Seq(
      env("c", None, Some((1L, 10.0)), "mysql-bin.000001", 100),
      env("u", Some((1L, 10.0)), Some((1L, 12.5)), "mysql-bin.000001", 200, wrapped = true),
      """{"oops": true}""",   // not an envelope
      "not json at all"       // corrupt line
    ).toDF("value")
    val (good, dlq) = Debezium.decodeWithDlq(raw)
    val rows = good.select("op", "tbl_name", "pos", "gtid", "after.value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    assert(rows.toSet == Set(
      ("c", "orders", 100L, "8f9d:17", 10.0),
      ("u", "orders", 200L, "8f9d:17", 12.5)))
    assert(dlq.as[String].collect().toSet ==
      Set("""{"oops": true}""", "not json at all"))
  }

  test("schema-pruned decode: identical values on its columns, narrowed structs, DLQ intact") {
    val raw = Seq(
      env("c", None, Some((1L, 10.0)), "mysql-bin.000001", 100),
      env("u", Some((1L, 10.0)), Some((2L, 12.5)), "mysql-bin.000001", 200, wrapped = true),
      env("d", Some((3L, 7.0)), None, "mysql-bin.000002", 50),
      """{"oops": true}""",
      "not json at all").toDF("value")
    val cols = Debezium.ImagedChangeColumns
    val (goodP, dlqP) = Debezium.decodeWithDlq(raw, columns = cols)
    val (goodF, dlqF) = Debezium.decodeWithDlq(raw)
    // the pruned frame carries exactly the requested top-level columns
    assert(goodP.columns.toSeq == Seq("before", "after", "op", "tbl_name", "file", "pos"))
    // …with the row structs narrowed to the requested leaves
    assert(goodP.schema("before").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("id"))
    assert(goodP.schema("after").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("id", "value"))
    // value parity with the full decode on the shared leaves, and the
    // downstream canonical mapping is unchanged by the pruning
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("op"), col("tbl_name"), col("file"), col("pos"),
        col("before.id"), col("after.id"), col("after.value"))
        .collect().map(_.toSeq).toSet
    assert(canon(goodP) == canon(goodF))
    assert(Debezium.toImagedChanges(goodP).collect().toSet ==
      Debezium.toImagedChanges(goodF).collect().toSet)
    assert(dlqP.as[String].collect().toSet == dlqF.as[String].collect().toSet)
  }

  test("default decode parses the FULL envelope schema — source.ts_ms included (15 leaves / 30 auto)") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.types.{DataType, StructType}
    // columns=Nil is documented as 'decode everything': the parse
    // schema must be the full envelopeSchema, not a silently-narrowed
    // variant that drops source.ts_ms (the one source field backing no
    // output column). The schema is the contract — under
    // spark.sql.json.enablePartialResults a type-malformed leaf only
    // nulls itself, but WHICH leaves exist governs what gets
    // materialized and how strict-mode parsers would behave.
    val raw = Seq(env("c", None, Some((1L, 10.0)), "f", 1)).toDF("value")
    val d = Debezium.decode(raw)
    val schemas = d.queryExecution.analyzed.flatMap(p =>
      p.expressions.flatMap(_.collect { case j: JsonToStructs => j.schema }))
    def leaves(dt: DataType): Int = dt match {
      case s: StructType => s.fields.map(f => leaves(f.dataType)).sum
      case _ => 1
    }
    // auto-mode schema = payload(env) + flat(env) = 2 × the 15-leaf
    // full envelope (before 2 + after 2 + source 7 + op + ts_ms + tx 2)
    assert(schemas.map(leaves).max == 30,
      s"default auto parse must carry the full 30-leaf schema, got ${schemas.map(leaves).max}")
    def flatten(prefix: String, s: StructType): Seq[String] = s.fields.flatMap(f =>
      f.dataType match {
        case n: StructType => flatten(s"$prefix${f.name}.", n)
        case _ => Seq(s"$prefix${f.name}")
      })
    val allLeaves = schemas.collect { case s: StructType => flatten("", s) }.flatten.toSet
    assert(allLeaves.contains("source.ts_ms"),
      s"source.ts_ms must be in the default parse schema, got: $allLeaves")
  }

  test("decode rejects unknown `columns` entries up front") {
    val raw = Seq(env("c", None, Some((1L, 10.0)), "f", 1)).toDF("value")
    val badTop = intercept[IllegalArgumentException](
      Debezium.decode(raw, columns = Seq("table_name")))
    assert(badTop.getMessage.contains("unknown column 'table_name'"))
    val badLeaf = intercept[IllegalArgumentException](
      Debezium.decode(raw, columns = Seq("after.val")))
    assert(badLeaf.getMessage.contains("names no field"))
    val badPath = intercept[IllegalArgumentException](
      Debezium.decode(raw, columns = Seq("op.x")))
    assert(badPath.getMessage.contains("only before/after"))
  }

  test("decodeWithDlq: both frames come off ONE single-parse projection (plan audit)") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    // a parquet-backed input — a local Seq would be constant-folded
    // into a LocalRelation and the audit would count zero parses
    val dir = java.nio.file.Files.createTempDirectory("graft_dbz_audit").toString
    Seq(
      env("c", None, Some((1L, 10.0)), "mysql-bin.000001", 100),
      "not json at all").toDF("value").write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    val (good, dlq) = Debezium.decodeWithDlq(raw)
    // The audit runs on the ANALYZED plan: each frame is authored as
    // exactly ONE from_json (the merged auto schema). Downstream the
    // optimizer's OptimizeJsonExprs deliberately rewrites that into
    // schema-PRUNED conditional parses (payload-only always; the flat
    // variant only inside the ELSE branch, i.e. for unwrapped rows) —
    // fewer parsed fields per row, not a second full parse — so the
    // optimized plan is not the single-parse invariant to pin.
    def nParses(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.flatMap(p =>
        p.expressions.flatMap(_.collect { case j: JsonToStructs => j.canonicalized }))
        .distinct.size
    assert(nParses(good) == 1, s"good frame must parse once, plan:\n${good.queryExecution.analyzed}")
    assert(nParses(dlq) == 1, s"dlq frame must parse once, plan:\n${dlq.queryExecution.analyzed}")
    // shared lineage: a batch caller can persist decodeRouted and
    // split it, making the one parse run once for BOTH sinks
    val routed = Debezium.decodeRouted(raw).persist()
    try {
      assert(routed.filter(col("op").isNotNull).count() == 1)
      assert(routed.filter(col("op").isNull).select("raw").as[String].collect().toSeq ==
        Seq("not json at all"))
    } finally routed.unpersist(blocking = false)
  }

  test("pinned decode format is one parse and routes the other form to null-op (DLQ reading)") {
    val flatLine = env("c", None, Some((1L, 10.0)), "mysql-bin.000001", 100)
    val wrappedLine = env("u", Some((1L, 10.0)), Some((1L, 12.5)), "mysql-bin.000001", 200, wrapped = true)
    val raw = Seq(flatLine, wrappedLine).toDF("value")
    val flatOnly = Debezium.decode(raw, format = "flat")
    assert(flatOnly.where(col("op").isNotNull).select("op").as[String].collect().toSeq == Seq("c"),
      "flat mode decodes only the flat line")
    val wrappedOnly = Debezium.decode(raw, format = "wrapped")
    assert(wrappedOnly.where(col("op").isNotNull).select("op").as[String].collect().toSeq == Seq("u"),
      "wrapped mode decodes only the wrapped line")
    // auto decodes both — the mixed-feed default
    assert(Debezium.decode(raw).where(col("op").isNotNull).count() == 2)
    intercept[IllegalArgumentException](Debezium.decode(raw, format = "nope"))
  }

  test("GTID resume tokens: executed window, next token, validation from the decoded gtid column") {
    import graft.cdc.Changelog
    // two sources: a's txs 3..7 survive purge, b executed 1..2
    val log = Seq("a:3", "a:5", "a:7", "b:1", "b:2", null)
      .toDF("gtid")
    val exec = Changelog.gtidExecuted(log)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(exec == Set(("a", 3L, 7L), ("b", 1L, 2L)))
    val next = Changelog.gtidNextPosition(log)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(next == Set(("a", 8L), ("b", 3L)))
    val tokens = Seq(
      ("a", 8L),   // next — valid
      ("a", 3L),   // oldest retained — valid
      ("a", 2L),   // purged — invalid
      ("a", 9L),   // beyond watermark — invalid
      ("c", 1L)    // unknown source — invalid
    ).toDF("source_uuid", "txno")
    val valid = Changelog.validateGtids(Changelog.gtidExecuted(log), tokens)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getInt(2))).toMap
    assert(valid == Map(("a", 8L) -> 1, ("a", 3L) -> 1, ("a", 2L) -> 0,
      ("a", 9L) -> 0, ("c", 1L) -> 0))
    // and straight off the wire: Debezium's decoded gtid column feeds the same ops
    val raw = Seq(
      env("c", None, Some((1L, 1.0)), "mysql-bin.000001", 1),
      env("c", None, Some((2L, 2.0)), "mysql-bin.000001", 2)).toDF("value")
    val fromWire = Changelog.gtidNextPosition(Debezium.decode(raw))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fromWire == Set(("8f9d", 18L)))
  }

  test("filePos orders across binlog file rotation") {
    val r = spark.range(1).select(
      Debezium.filePos(lit("mysql-bin.000001"), lit(900000L)).as("a"),
      Debezium.filePos(lit("mysql-bin.000002"), lit(4L)).as("b"))
      .collect()(0)
    assert(r.getLong(0) < r.getLong(1),
      "an early position in a later file must order after a late position in an earlier file")
    assert(r.getLong(0) == ((1L << 40) | 900000L))
  }

  test("snapshot reads, PK-changing updates and deletes map to the canonical ops") {
    val raw = Seq(
      env("r", None, Some((7L, 70.0)), "mysql-bin.000001", 10),    // snapshot read
      env("u", Some((7L, 70.0)), Some((8L, 71.0)), "mysql-bin.000001", 20), // PK 7→8
      env("d", Some((8L, 71.0)), None, "mysql-bin.000001", 30)     // delete
    ).toDF("value")
    val changes = Debezium.toImagedChanges(Debezium.decode(raw))
      .collect().sortBy(_.pos)
    assert(changes.map(c => (c.op, c.oldId, c.id)).toSeq ==
      Seq(("upsert", 7L, 7L), ("update", 7L, 8L), ("delete", 8L, 8L)))
    // and through expandUpdates: the PK swap becomes tombstone + upsert
    val prim = ChangelogStream.expandUpdates(
      Debezium.toImagedChanges(Debezium.decode(raw)))
      .collect().sortBy(c => (c.pos, c.op == "upsert"))
    assert(prim.map(c => (c.op, c.id)).toSeq ==
      Seq(("upsert", 7L), ("delete", 7L), ("upsert", 8L), ("delete", 8L)))
  }

  test("file-sourced Debezium stream drives UpsertSink+AggView exactly-once across restart") {
    val srcDir = Files.createTempDirectory("graft_dbz_src").toString
    val ckpt1 = Files.createTempDirectory("graft_dbz_ckpt1").toString
    val ckpt2 = Files.createTempDirectory("graft_dbz_ckpt2").toString
    val tableDir = Files.createTempDirectory("graft_dbz_table").toString
    val viewDir = Files.createTempDirectory("graft_dbz_view").toString

    def pipeline() = ChangelogStream.expandUpdates(
      Debezium.toImagedChanges(Debezium.decode(
        spark.readStream.text(srcDir))))
    def startSink() = UpsertSink.materialize(pipeline(), tableDir, ckpt1, numBuckets = 8)
    def startView() = AggView.materialize(pipeline(), (tbl, _) => tbl, viewDir, ckpt2)

    Files.write(Paths.get(srcDir, "batch1.json"), Seq(
      env("c", None, Some((1L, 10.0)), "mysql-bin.000001", 100),
      env("c", None, Some((2L, 20.0)), "mysql-bin.000001", 200, wrapped = true),
      env("u", Some((2L, 20.0)), Some((2L, 25.0)), "mysql-bin.000001", 300)
    ).mkString("\n").getBytes("UTF-8"))

    val q1 = startSink(); val v1 = startView()
    q1.processAllAvailable(); v1.processAllAvailable()
    q1.stop(); v1.stop()
    def snapshot(): Map[Long, Double] =
      UpsertSink.readCurrent(spark, tableDir)
        .select("id", "value").as[(Long, Double)].collect().toMap
    def view(): Map[String, (Double, Long)] =
      AggView.readCurrent(spark, viewDir)
        .as[(String, Double, Long)].collect().map { case (g, s, c) => g -> ((s, c)) }.toMap
    assert(snapshot() == Map(1L -> 10.0, 2L -> 25.0))
    assert(view() == Map("orders" -> ((35.0, 2L))))

    // restart from the checkpoints: batch1 must NOT re-apply (the sum
    // in the agg view would inflate if it did); the rotated file's
    // positions order after batch1's via filePos
    Files.write(Paths.get(srcDir, "batch2.json"), Seq(
      env("d", Some((1L, 10.0)), None, "mysql-bin.000002", 50),
      env("c", None, Some((3L, 7.0)), "mysql-bin.000002", 60)
    ).mkString("\n").getBytes("UTF-8"))
    val q2 = startSink(); val v2 = startView()
    q2.processAllAvailable(); v2.processAllAvailable()
    q2.stop(); v2.stop()
    assert(snapshot() == Map(2L -> 25.0, 3L -> 7.0))
    assert(view() == Map("orders" -> ((32.0, 2L))))
  }
}
