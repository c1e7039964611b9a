package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only staged diagnostic for the prefix-filter pair mining (deleted
  * after use or kept as a dev tool): counts rows per stage WITHOUT the
  * array payloads, to localize shuffle blowups at scale points.
  */
object DiagBigram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = 0.7
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.NativeExpressions.register(spark)
    val TF = graft.functions.TextFunctions
    val tok = graft.Tables.load(spark, dir, "documents").select(col("doc_id"),
      explode(call_function("graft_bigrams", TF.tokens(col("text")))).as("w"))
    println(s"[diag] tok rows      = ${tok.count()}")
    println(s"[diag] vocab         = ${tok.select("w").distinct().count()}")
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val sorted = tok.join(dfreq, "w")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("w")))).as("sw"))
      .select(col("doc_id"), size(col("sw")).cast("long").as("n"),
        expr("transform(slice(sw, 1, cast(size(sw) - ceil(size(sw) * 0.7) + 1 as int)), p -> p.w)").as("pw"))
    val pref = sorted.select(col("doc_id"), col("n"), explode(col("pw")).as("w"))
    println(s"[diag] prefix rows   = ${pref.count()}")
    val pdf = pref.groupBy("w").agg(count(lit(1)).as("pdf"))
    println("[diag] top prefix dfs:")
    pdf.orderBy(desc("pdf")).limit(10).collect().foreach(r => println(s"  ${r}"))
    val joinRows = pdf.agg(sum(col("pdf") * col("pdf"))).head().getLong(0)
    println(s"[diag] sum pdf^2 (join rows upper bound) = $joinRows")
    val p2 = pref.select(col("doc_id"), col("n"), col("w"))
    val cand = p2.as("a").join(p2.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * t)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    println(s"[diag] cand rows (pre-dedup)  = ${cand.count()}")
    println(s"[diag] cand pairs (deduped)   = ${cand.dropDuplicates("doc_a", "doc_b").count()}")

    // ---- SET-level stats for the bitset path's (prefix, band) blocking
    val sets = tok.groupBy("doc_id")
      .agg(sort_array(collect_set("w")).as("ws"))
      .groupBy("ws").agg(count(lit(1)).as("members"))
      .select(col("ws"), size(col("ws")).cast("long").as("n"), col("members"))
    println(s"[diag] distinct sets S        = ${sets.count()}")
    val bandExpr = floor(log(col("n").cast("double")) / lit(math.log(1.0 / t)))
    println("[diag] sets per size band:")
    sets.groupBy(bandExpr.as("band")).agg(count(lit(1)).as("s"))
      .orderBy("band").collect().foreach(r => println(s"  $r"))
    // prefix of each distinct set = its (set-df asc, w asc)-rarest
    // n - ceil(t*n) + 1 elements; measure the (prefix element, band) key
    // distribution the bitset path's candidate join would see
    val sdf = sets.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("sdf"))
    val sid = sets.withColumn("sid", monotonically_increasing_id())
    val plen = (col("n") * lit(math.round(t * 1e6)) + lit(999999L))
    val spref = sid.select(col("sid"), col("n"), bandExpr.as("band"),
        explode(col("ws")).as("w"))
      .join(sdf, "w")
      .groupBy("sid", "n", "band")
      .agg(array_sort(collect_list(struct(col("sdf"), col("w")))).as("sw"))
      .select(col("sid"), col("n"), col("band"),
        explode(expr(s"transform(slice(sw, 1, cast(n - ((n * ${math.round(t*1e6)} + 999999) div 1000000) + 1 as int)), p -> p.w)")).as("pw"))
    println(s"[diag] set prefix rows        = ${spref.count()}")
    val keyDf = spref.groupBy("pw", "band").agg(count(lit(1)).as("kdf"))
    println("[diag] top (prefix, band) key dfs:")
    keyDf.orderBy(desc("kdf")).limit(10).collect().foreach(r => println(s"  $r"))
    val est = keyDf.agg(sum(col("kdf") * col("kdf"))).head().getLong(0)
    println(s"[diag] sum kdf^2 (same-band candidate rows, x3 for band+-1) = $est")
    spark.stop()
  }
}
