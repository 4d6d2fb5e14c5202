package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: inspect schemas and physical plans.
  *
  *  - `runMain graft.Explain read <parquetPath>`  → schema + 3 rows
  *  - `runMain graft.Explain plan <queryName> <sfDir>` → formatted plan
  *  - `runMain graft.Explain run <queryName> <sfDir>`  → show(20)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "read" :: path :: Nil =>
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(3, truncate = false)
      case "plan" :: name :: sfDir :: Nil =>
        Queries.queries(name)(spark, sfDir).explain("formatted")
      case "run" :: name :: sfDir :: Nil =>
        Queries.queries(name)(spark, sfDir).show(20, truncate = false)
      case "sql" :: stmt :: Nil =>
        graft.plans.GraftExtensions.register(spark)
        spark.sql(stmt).show(20, truncate = false)
      case "kcenter" :: sfDir :: k :: Nil =>
        // time the parameterized greedy k-center walk (VERDICT r9 #6):
        // one warm-up, then min-of-2 — documents the k-knee of the
        // driver-loop design in docs/SCALING.md
        def once(): Double = {
          val t0 = System.nanoTime()
          VectorQueries.kCenterCoreset(spark, sfDir, k.toInt)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up: codegen/JIT
        val t = Seq(once(), once()).min
        println(f"kcenter k=$k sf=$sfDir min_sec=$t%.2f")
      case "bpetrain" :: sfDir :: rounds :: Nil =>
        // time the parameterized BPE training walk — documents the
        // rounds-knee of the driver-loop design (the q201 k-knee
        // discipline) in docs/SCALING.md
        def onceB(): Double = {
          val t0 = System.nanoTime()
          TextQueries.bpeTrain(spark, sfDir, rounds.toInt)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        onceB() // warm-up: codegen/JIT
        val tB = Seq(onceB(), onceB()).min
        println(f"bpetrain rounds=$rounds sf=$sfDir min_sec=$tB%.2f")
      case "bpebatch" :: sfDir :: rounds :: p :: cap :: Nil =>
        // time the BATCHED training walk at (rounds, p, topCap) —
        // documents the p-knee of the batched driver-loop design
        // (VERDICT r10 #4): equal-merge-budget sweeps hold rounds*p
        // constant and vary p, so the knee is where compatible-
        // candidate exhaustion stops p from buying fewer round-trips
        var got = 0L
        def onceP(): Double = {
          val t0 = System.nanoTime()
          val out = TextQueries.bpeTrainBatched(spark, sfDir,
            rounds.toInt, p.toInt, cap.toInt)
          got = out.count() // merge count: observes exhaustion
          (System.nanoTime() - t0) / 1e9
        }
        onceP() // warm-up: codegen/JIT
        val tP = Seq(onceP(), onceP()).min
        println(f"bpebatch rounds=$rounds p=$p cap=$cap sf=$sfDir " +
          f"merges=$got min_sec=$tP%.2f")
      case "planmany" :: sfDir :: outDir :: names :: Nil =>
        // Dump `.explain("formatted")` for a comma-separated query list
        // into <outDir>/<query>.txt in ONE session (the plans/r13
        // artifact generator — one sbt+Spark spin-up instead of one per
        // query). Building a plan executes any driver-side training the
        // query function runs; that is the point: the dumped plan is the
        // one the bench executes.
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
          val plan = Queries.queries(n)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$n.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $outDir/$n.txt")
        }
      case "profile" :: names :: sfDir :: Nil =>
        // Per-JOB wall-clock profile of queries (dev-only; the bench
        // never runs this): one untimed warm-up, then a timed run with a
        // job listener — tells driver-loop queries where their seconds
        // go (job count x scheduling floor vs one dominant job), which
        // explain() cannot show once subtrees hide behind checkpoints.
        val jobs = collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
        val starts = collection.concurrent.TrieMap.empty[Int, (Long, String)]
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(js.jobId) = (js.time,
              js.stageInfos.headOption.map(_.name).getOrElse(""))
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.get(je.jobId).foreach { case (t0, nm) =>
              jobs.synchronized { jobs += ((je.jobId, je.time - t0, nm)) } }
        }
        spark.sparkContext.addSparkListener(listener)
        names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
          val fn = Queries.queries(name)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
          jobs.synchronized(jobs.clear())
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000) // listener bus drain
          jobs.synchronized {
            val tot = jobs.map(_._2).sum
            println(f"PROFILE $name wall=$wall%.2f s, ${jobs.size} jobs, " +
              f"sum(job)=${tot / 1000.0}%.2f s (gap=${wall - tot / 1000.0}%.2f s)")
            jobs.sortBy(_._1).foreach { case (id, ms, nm) =>
              println(f"  job $id%4d ${ms}%6d ms  $nm") }
          }
        }
        // deregister: a leaked listener double-counts jobs if another
        // profiling pass runs in this session (ADVICE r13)
        spark.sparkContext.removeSparkListener(listener)
      case "audit" :: sfDir :: Nil =>
        // One summary line per query: shuffle/join/agg shape + pushdown.
        println("| query | joins | aggs | exchanges | pushed filters |")
        println("|---|---|---|---|---|")
        Queries.all.foreach { case (name, q) =>
          val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
          def n(p: String) = p.r.findAllIn(plan).size
          val joins = Seq(
            "BroadcastHashJoin" -> n("BroadcastHashJoin"),
            "SortMergeJoin" -> n("SortMergeJoin"),
            "ShuffledHashJoin" -> n("ShuffledHashJoin"),
            "BNLJ" -> n("BroadcastNestedLoopJoin"))
            .filter(_._2 > 0).map { case (k, v) => s"$v $k" }.mkString(", ")
          val aggs = Seq(
            "Hash" -> n("(?<!Object)HashAggregate"),
            "ObjHash" -> n("ObjectHashAggregate"),
            "Sort" -> n("SortAggregate"))
            .filter(_._2 > 0).map { case (k, v) => s"$v $k" }.mkString(", ")
          val pushed = n("PushedFilters: \\[[^\\]]")
          println(s"| $name | $joins | $aggs | ${n("Exchange")} | $pushed scans |")
        }
      case other => sys.error(s"unknown args: $other")
    }
    spark.stop()
  }
}
