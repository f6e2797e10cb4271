package graft

import java.nio.file.Files

/** Smoke tests for the user-facing CLI drivers: the reference's argparse
  * surface (write_session_batch.py:106-130, send_session_stream.py:114-118)
  * must be reachable end-to-end from string args alone. */
class PipelineCliSpec extends SparkSpec {

  private lazy val csvPath: String = {
    val dir = new java.io.File(TempDirs.create("graft_cli_csv_"))
    val f = new java.io.File(dir, "events.csv")
    val rows = Seq(
      "event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session",
      "2019-11-01 09:00:00 UTC,view,1001,2001,electronics.smartphone,apple,999.99,u1,s1",
      "2019-11-01 09:05:00 UTC,cart,1001,2001,electronics.smartphone,apple,999.99,u1,s1",
      "2019-11-01 09:10:00 UTC,purchase,1001,2001,electronics.smartphone,apple,999.99,u1,s1",
      "2019-11-01 10:00:00 UTC,view,1002,2002,appliances.kitchen.refrigerators.lg,,349.5,u2,s2",
      "2019-11-01 23:30:00 UTC,view,1003,2003,apparel.shoes.keds,fila,89.0,u3,s3")
    Files.write(f.toPath, String.join("\n", rows: _*).getBytes("UTF-8"))
    f.getAbsolutePath
  }

  test("batch CLI: --input/--output runs the pipeline and lands parquet") {
    val out = TempDirs.create("graft_cli_batch_out_")
    BatchPipelineCli.main(Array("--input", csvPath, "--output", out))
    val df = spark.read.parquet(out)
    assert(df.count() === 5)
    // the batch transform ran: dict-packed category + synthetic record ids
    assert(df.columns.contains("record_id"))
    val packed = df.select("category_code").collect().map(_.getString(0))
    assert(packed.exists(_.startsWith("{'category': 'electronics'")))
  }

  test("replay CLI: --speedFactor paces the wire replay into the sink") {
    val out = TempDirs.create("graft_cli_replay_out_")
    ReplayPipelineCli.main(
      Array("--input", csvPath, "--output", out, "--speedFactor", "5"))
    val df = spark.read.parquet(out)
    assert(df.count() === 5)
    // decode restored the reference's rejoined timestamp string, and the
    // stream transform ran downstream of it
    assert(df.columns.contains("event_time_string"))
    assert(df.select("event_time_string").collect()
      .forall(_.getString(0).endsWith("UTC")))
  }

  test("batch CLI --jdbcUrl lands the OLTP table and agrees with the parquet sink") {
    val out = TempDirs.create("graft_cli_jdbc_out_")
    val db = TempDirs.create("graft_cli_derby_")
    val url = s"jdbc:derby:$db/oltp;create=true"
    BatchPipelineCli.main(Array(
      "--input", csvPath, "--output", out, "--jdbcUrl", url, "--table", "cli_sessions"))
    val parquet = spark.read.parquet(out)
    val jdbc = graft.operators.EcommercePipelines.readOltp(spark, url, "cli_sessions")
    assert(jdbc.count() === 5)
    // both sinks came from ONE plan execution: identical record_id sets
    // (re-execution would re-mint layout-dependent ids)
    val pIds = parquet.select("record_id").collect().map(_.getLong(0)).toSet
    val jIds = jdbc.select("record_id").collect().map(_.getLong(0)).toSet
    assert(pIds === jIds)
  }

  test("batch CLI accepts --instance_id/--database_id as JDBC-target aliases") {
    val out = TempDirs.create("graft_cli_alias_out_")
    val db = TempDirs.create("graft_cli_alias_derby_")
    val url = s"jdbc:derby:$db/oltp;create=true"
    // the reference's Spanner coordinates (write_session_batch.py:111-121),
    // canonicalized onto --jdbcUrl/--table
    BatchPipelineCli.main(Array(
      "--input", csvPath, "--output", out,
      "--instance_id", url, "--database_id", "alias_sessions"))
    val jdbc = graft.operators.EcommercePipelines.readOltp(spark, url, "alias_sessions")
    assert(jdbc.count() === 5)
    // alias + canonical together is ambiguous and must fail fast
    val e = intercept[RuntimeException] {
      BatchPipelineCli.main(Array(
        "--input", csvPath, "--instance_id", url, "--jdbcUrl", url))
    }
    assert(e.getMessage.contains("alias"))
  }

  test("replay CLI with --topic/--subscription uses the channel lifecycle") {
    val out = TempDirs.create("graft_cli_replay_ch_out_")
    val root = TempDirs.create("graft_cli_chroot_")
    ReplayPipelineCli.main(Array(
      "--input", csvPath, "--output", out, "--speedFactor", "5",
      "--topic", "sessions", "--subscription", "etl", "--channelRoot", root))
    assert(spark.read.parquet(out).count() === 5)
    // the managed channel was created, published to, and left queryable
    val ch = graft.streaming.Channels(root)
    assert(ch.listTopics() === Seq("sessions"))
    assert(ch.listSubscriptions() === Seq("etl"))
  }

  test("replay CLI --perEvent paces one micro-batch per distinct event time") {
    val out = TempDirs.create("graft_cli_pevent_out_")
    val outStream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outStream, true, "UTF-8")) {
      ReplayPipelineCli.main(
        Array("--input", csvPath, "--output", out, "--perEvent", "true"))
    }
    val df = spark.read.parquet(out)
    assert(df.count() === 5)
    assert(df.columns.contains("event_time_string"))
    // the fixture has 5 distinct event times → 5 micro-batches, and the
    // receipt says so (the simulate_session_stream.py per-publish loop)
    assert(outStream.toString("UTF-8").contains("5 micro-batches (per-event Δt)"))
  }

  test("replay CLI --wallclock fires real ProcessingTime micro-batches") {
    // VERDICT r8 #6: the reference demo's wall-clock cadence as a CLI mode.
    // 14.5 h fixture at speedFactor 5 → 3 publishing minutes; each minute
    // compressed to 300 ms real time. Flake-bounded like StreamingSpec's
    // ProcessingTime smoke: the assertion is ≥2 non-empty wall-clock
    // firings (the third can land after the bounded poll on a loaded
    // host), plus the full row count — completeness never depends on
    // pacing.
    val out = TempDirs.create("graft_cli_wallclock_out_")
    val outStream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outStream, true, "UTF-8")) {
      ReplayPipelineCli.main(Array(
        "--input", csvPath, "--output", out, "--speedFactor", "5",
        "--wallclock", "true", "--minuteMs", "300"))
    }
    assert(spark.read.parquet(out).count() === 5)
    val receipt = outStream.toString("UTF-8")
    val fired = "wall-clock trigger: (\\d+) non-empty".r
      .findFirstMatchIn(receipt).map(_.group(1).toInt)
    assert(fired.exists(_ >= 2), s"expected >=2 wall-clock micro-batches, receipt:\n$receipt")
  }

  test("replay CLI rejects --wallclock together with --perEvent") {
    val out = TempDirs.create("graft_cli_wallclock_bad_")
    val e = intercept[RuntimeException](ReplayPipelineCli.main(Array(
      "--input", csvPath, "--output", out,
      "--perEvent", "true", "--wallclock", "true")))
    assert(e.getMessage.contains("--wallclock applies to speed-factor"))
  }

  test("replay CLI rejects --perEvent together with --speedFactor") {
    val out = TempDirs.create("graft_cli_pevent_bad_")
    val e = intercept[RuntimeException](ReplayPipelineCli.main(Array(
      "--input", csvPath, "--output", out,
      "--perEvent", "true", "--speedFactor", "3")))
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("slice count maps speedFactor like the reference's publishing rate") {
    // 14.5h of fixture data at 5 h/min → 3 simulated minutes
    assert(ReplayPipelineCli.sliceCount(14.5, 5) === 3)
    assert(ReplayPipelineCli.sliceCount(0.0, 1) === 1) // degenerate span
    assert(ReplayPipelineCli.sliceCount(10000.0, 1) === 96) // bounded
  }

  test("replay CLI refuses unparseable event_time instead of dropping rows") {
    val dir = new java.io.File(TempDirs.create("graft_cli_badts_"))
    val f = new java.io.File(dir, "bad.csv")
    Files.write(f.toPath, String.join("\n",
      "event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session",
      "2019-11-01 09:00:00 UTC,view,1,2,a.b,x,1.0,u1,s1",
      "2019-11-01 09:05:00,view,1,2,a.b,x,1.0,u1,s1" // no zone suffix
    ).getBytes("UTF-8"))
    val out = TempDirs.create("graft_cli_badts_out_")
    val e = intercept[RuntimeException](ReplayPipelineCli.main(
      Array("--input", f.getAbsolutePath, "--output", out)))
    assert(e.getMessage.contains("refusing to silently drop"))
  }

  test("replay CLI errors on a data-less input instead of an NPE") {
    val dir = new java.io.File(TempDirs.create("graft_cli_hdr_"))
    val f = new java.io.File(dir, "hdr.csv")
    Files.write(f.toPath,
      "event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session"
        .getBytes("UTF-8"))
    val out = TempDirs.create("graft_cli_hdr_out_")
    val e = intercept[RuntimeException](ReplayPipelineCli.main(
      Array("--input", f.getAbsolutePath, "--output", out)))
    assert(e.getMessage.contains("no data rows"))
  }

  test("bad args fail fast with usage, not a stack of Spark errors") {
    val e = intercept[RuntimeException](
      BatchPipelineCli.main(Array("--bogus", "x")))
    assert(e.getMessage.contains("usage:"))
    val m = intercept[RuntimeException](
      ReplayPipelineCli.main(Array("--input", csvPath)))
    assert(m.getMessage.contains("missing required --output"))
  }
}
