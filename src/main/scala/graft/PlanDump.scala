package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement tool (guide §1): for each named
  * query, dump `.explain("formatted")` to `<outDir>/<name>_<tag>.txt`
  * and print a per-stage task-time breakdown of one timed noop-sink
  * execution, so plan shape (Exchange count, join strategy,
  * PushedFilters) and where the seconds actually go are captured
  * together. Never run by the driver — a builder-side diagnostic.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <name,name,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    // Stage accounting: map stage → job description at submission so
    // stage task-time can be attributed to the query that ran it.
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long, Int)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var current = ""
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          stageNames.put(si.stageId, si.name.takeWhile(_ != '\n').take(70))
          stageRows.add((current, si.stageId, m.executorRunTime,
            m.shuffleReadMetrics.fetchWaitTime + m.shuffleWriteMetrics.writeTime / 1000000,
            si.numTasks))
        }
      }
    })

    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    // one untimed warmup (JIT + parquet footers), same as Bench
    try SparkEntry.all.head.run(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    wanted.foreach { n =>
      byName.get(n) match {
        case None => System.err.println(s"[plandump] no such query: $n")
        case Some(q) =>
          try {
            val df = q.run(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
            current = n
            stageRows.removeIf(r => r._1 == n)
            spark.sparkContext.setJobDescription(n)
            val t0 = System.nanoTime()
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            current = ""
            Thread.sleep(200) // let listener drain
            import scala.jdk.CollectionConverters._
            val rows = stageRows.asScala.filter(_._1 == n).toVector.sortBy(-_._3)
            println(f"[plandump] $n%-28s $sec%7.2f s  stages=${rows.size}")
            rows.take(12).foreach { case (_, sid, run, shuf, nt) =>
              println(f"    stage $sid%5d  runTime=${run / 1000.0}%8.1f s  shufWait+write=${shuf / 1000.0}%7.1f s  tasks=$nt%4d  ${stageNames.getOrDefault(sid, "")}")
            }
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
