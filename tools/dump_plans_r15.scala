// Dump .explain("formatted") for the round-15 optimization targets into
// plans/r15/<query>_<tag>.txt. Usage (tag = before|after, names comma-sep):
//   LANG=C.UTF-8 PLAN_TAG=before PLAN_QUERIES=q93_shard_manifest,q95_corpus_to_shards \
//   /opt/spark/bin/spark-shell --master local[8] --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --driver-class-path target/scala-2.13/classes -i tools/dump_plans_r15.scala
import java.io.PrintWriter
import java.nio.file.{Files, Paths}
val d = sys.env.getOrElse("PLAN_SF_DIR", "/root/testdata/sf0.01")
val tag = sys.env.getOrElse("PLAN_TAG", "before")
val names = sys.env.getOrElse("PLAN_QUERIES", "").split(',').map(_.trim).filter(_.nonEmpty)
Files.createDirectories(Paths.get("/root/repo/plans/r15"))
names.foreach { name =>
  val df = graft.SparkEntry.queries(name)(spark, d)
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  val clamped = plan.linesIterator
    .map(l => if (l.length > 500) l.take(500) + s" ...[+${l.length - 500} chars]" else l)
    .mkString("\n")
  val w = new PrintWriter(s"/root/repo/plans/r15/${name}_$tag.txt")
  try { w.println(s"# $name — explain(formatted), $tag (sf dir: $d)\n"); w.println(clamped) }
  finally w.close()
  println(s"dumped $name -> plans/r15/${name}_$tag.txt")
}
sys.exit(0)
