package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** DSv2 NDJSON read path: declared-schema scan, column pruning reaching
  * the parse, batch-commit gating on the sink's _SUCCESS-<queryId>
  * markers, and PERMISSIVE malformed-line handling. */
class NdjsonScanSpec extends SparkSpec {

  test("scan round-trips the sink's output through the connector") {
    import spark.implicits._
    val dir = tmpDir("ndjson-scan-rt")
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "gamma", 2.0))
      .toDF("id", "s", "v")
    df.repartition(2).write.format("graft-ndjson").mode("append").save(dir)

    val back = spark.read.format("graft-ndjson").schema(df.schema).load(dir)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("column pruning reaches the scan's read schema") {
    import spark.implicits._
    val dir = tmpDir("ndjson-scan-prune")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
      .coalesce(1).write.format("graft-ndjson").mode("append").save(dir)

    val schema = spark.read.format("graft-ndjson")
      .schema("id LONG, s STRING, v DOUBLE").load(dir)
      .select("s")
    val scanDesc = schema.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("ReadSchema: struct<s:string>"),
      s"pruned schema not in scan: $scanDesc")
    assert(schema.as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("committedOnly gates unmarked part files; raw logs always visible") {
    import spark.implicits._
    val dir = tmpDir("ndjson-scan-commit")
    Seq((1L, "ok")).toDF("id", "s")
      .coalesce(1).write.format("graft-ndjson").mode("append").save(dir)
    // a part file whose batch marker never landed (write job died between
    // task commit and job commit) + a raw rotated trace log with no batch
    Files.write(Paths.get(dir, "part-00000-deadbeef.ndjson"),
      "{\"id\":99,\"s\":\"orphan\"}\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "trace.0042.json"),
      "{\"id\":7,\"s\":\"rawlog\"}\n".getBytes("UTF-8"))

    val gated = spark.read.format("graft-ndjson").schema("id LONG, s STRING").load(dir)
    assert(gated.select("s").as[String].collect().sorted.toSeq == Seq("ok", "rawlog"))

    val all = spark.read.format("graft-ndjson").schema("id LONG, s STRING")
      .option("committedOnly", "false").load(dir)
    assert(all.count() == 3)
  }

  test("malformed lines null out instead of failing the task") {
    val dir = tmpDir("ndjson-scan-bad")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "trace.json"),
      "{\"id\":1,\"s\":\"good\"}\nnot json at all\n{\"id\":2,\"s\":\"also good\"}\n"
        .getBytes("UTF-8"))
    val back = spark.read.format("graft-ndjson").schema("id LONG, s STRING").load(dir)
    assert(back.count() == 3)
    assert(back.where("id IS NOT NULL").count() == 2)
  }

  test("read without a schema fails with the no-inference contract") {
    val dir = tmpDir("ndjson-scan-noschema")
    Files.createDirectories(Paths.get(dir))
    val e = intercept[Exception] {
      spark.read.format("graft-ndjson").load(dir).collect()
    }
    assert(e.getMessage != null)
  }
}
