package graft.queries

import graft.{Q, Tables}
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-data-pipeline operators (SURVEY.md §2.11 / BASELINE.json north star)
  * over the driver's `documents` and `embeddings` tables: deduplication
  * (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding-cosine),
  * similarity search (brute-force and IVF-style ANN), and text analysis
  * (word counts, quality features, language-ID, token counting,
  * fingerprinting).
  *
  * Scale stance: every op is a shuffle-aggregation or an equi-key join —
  * nothing collects to the driver. The only quadratic op (all-pairs cosine)
  * is the *oracle-exact baseline*; its scale path is the LSH/IVF variant
  * registered beside it.
  */
object Llm {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val all: Seq[Q] = Seq(

    // ---- X1 exact dedup: keep-min-id per (lang, n_chars) group
    Q("x1_dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .groupBy("lang", "n_chars")
          .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_dups"))
          .orderBy("lang", "n_chars"),
      Some("""SELECT lang, n_chars, MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
             |FROM documents GROUP BY lang, n_chars ORDER BY lang, n_chars""".stripMargin)),

    // ---- X1 dedup stats over exact text equality
    Q("x1_dedup_stats",
      (s, dir) =>
        docs(s, dir).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_unique_texts"),
          countDistinct(col("lang")).as("n_langs")),
      Some("""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_texts,
             |  COUNT(DISTINCT lang) AS n_langs FROM documents""".stripMargin)),

    // ---- X2 exact n-gram (unigram-set) Jaccard near-dup pairs.
    // Distributed exact algorithm: explode distinct tokens, self-join on the
    // token (equi key -> hash join), count intersections per pair, derive
    // |union| = |A| + |B| - |A∩B|. At 100 TB you'd cap document frequency per
    // token first (hot-token skew); here the oracle requires exactness.
    Q("x2_jaccard_exact",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), TF.tokenSet(col("text")).as("toks"))
        val tok = d.select(col("doc_id"), explode(col("toks")).as("w"))
        val cnt = d.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
        val inter = tok.as("a")
          .join(tok.as("b"), col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("i"))
        inter
          .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
          .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
          .withColumn("j", col("i").cast("double") /
            (col("ca.n") + col("cb.n") - col("i")).cast("double"))
          .filter(col("j") >= 0.9)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH tok AS (SELECT doc_id, UNNEST(list_distinct(string_split(text,' '))) AS w
             |            FROM documents),
             |cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
             |          FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |  ROUND(CAST(i AS DOUBLE)/(ca.n + cb.n - i), 4) AS jaccard
             |FROM inter JOIN cnt ca ON ca.doc_id = doc_a
             |           JOIN cnt cb ON cb.doc_id = doc_b
             |WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- X2 MinHash + LSH near-dup (the scale path: candidates via band
    // buckets instead of all pairs; candidates then verified with exact
    // 3-shingle Jaccard). Hash-function-dependent -> rows-only check; recall
    // vs the exact twin is asserted in MinHashSpec.
    Q("x2_minhash_lsh",
      (s, dir) => {
        // b=16 bands of r=2: P(candidate | j) = 1-(1-j^2)^16 = 0.99 at j=0.5,
        // so recall at the 0.5 verify threshold is near-exact while the
        // bucket join stays tiny
        val numHashes = 32; val bands = 16; val rows = numHashes / bands
        val d = docs(s, dir).select(
          col("doc_id"),
          TF.shingles(col("text"), 3).as("sh"))
        val sig = d.select(col("doc_id"), col("sh"),
          TF.minhashSignature(col("sh"), numHashes).as("sig"))
        val banded = sig.select(col("doc_id"), col("sh"),
          explode(TF.bandKeys(col("sig"), bands, rows)).as("bk"))
        val cand = banded.as("a")
          .join(banded.as("b"),
            col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
          .dropDuplicates("doc_a", "doc_b")
        cand
          .withColumn("j", TF.jaccard(col("sh_a"), col("sh_b")))
          .filter(col("j") >= 0.5)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      None),

    // ---- X2 SimHash fingerprints: 64-bit, from distinct-token xxhash64 bit
    // votes. Fully distributed: (doc, bit) vote rows -> sum -> bit assembly.
    Q("x2_simhash",
      (s, dir) => {
        val tok = docs(s, dir).select(col("doc_id"),
          explode(TF.tokenSet(col("text"))).as("w"))
          .withColumn("h", xxhash64(col("w")))
        val votes = tok
          .select(col("doc_id"), col("h"),
            explode(sequence(lit(0), lit(63))).as("bit"))
          .withColumn("vote", TF.bitVote(col("h"), col("bit")))
        votes.groupBy("doc_id", "bit")
          .agg(sum("vote").as("v"))
          .withColumn("contrib",
            when(col("v") > 0,
              call_function("shiftleft", lit(1L), col("bit"))).otherwise(lit(0L)))
          .groupBy("doc_id")
          .agg(sum("contrib").as("simhash"))
          .orderBy("doc_id")
      },
      None),

    // ---- X5/X2 embedding-cosine near-dup pairs (exact all-pairs baseline,
    // oracle-checked; broadcast one side — embeddings dim table is small, the
    // LSH/IVF variant below is the 100 TB path)
    Q("x5_embedding_neardup",
      (s, dir) => {
        val e = embs(s, dir).select(col("vec_id"), VF.toDouble(col("embedding")).as("v"))
        val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("sim", VF.dot(col("va"), col("vb")) /
            (VF.l2Norm(col("va")) * VF.l2Norm(col("vb"))))
          .filter(col("sim") >= 0.35)
          .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                               CAST(b.embedding AS DOUBLE[])), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                             CAST(b.embedding AS DOUBLE[])) >= 0.35
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- X3 brute-force top-k cosine similarity search: every 50th vector is
    // a query; queries are broadcast against the full corpus; per-query top-k
    // via ranking window. This is the exact baseline for ANN.
    Q("x3_knn_brute",
      (s, dir) => {
        val e = embs(s, dir).select(col("vec_id"), VF.toDouble(col("embedding")).as("v"))
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        val w = Window.partitionBy("query_id").orderBy(desc("s"), asc("neighbor_id"))
        e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
          .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .withColumn("s", VF.dot(col("qv"), col("nv")) /
            (VF.l2Norm(col("qv")) * VF.l2Norm(col("nv"))))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("rk"), col("neighbor_id"), round(col("s"), 4).as("sim"))
          .orderBy("query_id", "rk")
      },
      Some("""SELECT query_id, rk, neighbor_id, ROUND(s, 4) AS sim FROM (
             |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
             |                           CAST(n.embedding AS DOUBLE[])) AS s,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
             |                                      CAST(n.embedding AS DOUBLE[])) DESC,
             |               n.vec_id) AS BIGINT) AS rk
             |  FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
             |  WHERE q.vec_id % 50 = 0)
             |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    // ---- X3 IVF-style ANN (scale path): coarse-quantize the corpus into
    // per-label centroid cells (computed distributively), probe the 3 nearest
    // cells per query, exact-search only inside probed cells. Approximate ->
    // rows-only check; recall vs x3_knn_brute asserted in AnnSpec.
    Q("x3_knn_ivf",
      (s, dir) => {
        val e = embs(s, dir).select(col("vec_id"), col("label"),
          VF.toDouble(col("embedding")).as("v"))
        // centroids: element-wise mean per label, assembled back into arrays
        val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("label", "pos").agg(avg("x").as("m"))
          .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("m"))))
            .as("pm"))
          .select(col("label").as("c_label"), expr("transform(pm, p -> p.m)").as("cv"))
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        // probe: 3 closest centroids per query
        val wc = Window.partitionBy("query_id").orderBy(desc("cs"), asc("c_label"))
        val probes = q.join(broadcast(cent), lit(true))
          .withColumn("cs", VF.dot(col("qv"), col("cv")) /
            (VF.l2Norm(col("qv")) * VF.l2Norm(col("cv"))))
          .withColumn("crk", row_number().over(wc))
          .filter(col("crk") <= 3)
          .select(col("query_id"), col("qv"), col("c_label"))
        // exact search within probed cells only
        val w = Window.partitionBy("query_id").orderBy(desc("s"), asc("neighbor_id"))
        e.select(col("vec_id").as("neighbor_id"), col("label"), col("v").as("nv"))
          .join(broadcast(probes),
            col("label") === col("c_label") && col("neighbor_id") =!= col("query_id"))
          .withColumn("s", VF.dot(col("qv"), col("nv")) /
            (VF.l2Norm(col("qv")) * VF.l2Norm(col("nv"))))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("rk"), col("neighbor_id"), round(col("s"), 4).as("sim"))
          .orderBy("query_id", "rk")
      },
      None),

    // ---- A7: per-label centroid, flattened to (label, pos, value) rows so the
    // aggregation is fully distributed and the oracle is engine-neutral
    Q("q_label_centroids",
      (s, dir) =>
        embs(s, dir)
          .select(col("label"), posexplode(VF.toDouble(col("embedding"))).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(round(avg("x"), 4).as("cv"))
          .select(col("label"), col("pos").cast("long").as("pos"), col("cv"))
          .orderBy("label", "pos"),
      Some("""SELECT label, pos, ROUND(AVG(val), 4) AS cv FROM (
             |  SELECT label, CAST(generate_subscripts(embedding,1) AS BIGINT)-1 AS pos,
             |    UNNEST(CAST(embedding AS DOUBLE[])) AS val
             |  FROM embeddings)
             |GROUP BY label, pos ORDER BY label, pos""".stripMargin)),

    // ---- X4 word frequency (top 100)
    Q("x4_wordcount",
      (s, dir) =>
        docs(s, dir)
          .select(explode(TF.tokens(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("word"))
          .limit(100),
      Some("""SELECT word, COUNT(*) AS n
             |FROM (SELECT UNNEST(string_split(text,' ')) AS word FROM documents)
             |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin)),

    // ---- X4 per-language stats
    Q("x4_lang_stats",
      (s, dir) =>
        docs(s, dir).groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          // integer sum / count: exact in both engines, stable under rounding
          round(sum("n_chars").cast("double") / count(lit(1)), 2).as("avg_chars"),
          sum(length(col("text")).cast("long")).as("total_len"),
          countDistinct(col("source")).as("n_sources"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  ROUND(CAST(SUM(n_chars) AS DOUBLE)/COUNT(*),2) AS avg_chars,
             |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len,
             |  COUNT(DISTINCT source) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- X4 per-doc quality features (length / word stats / type-token ratio)
    Q("x4_doc_features",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        docs(s, dir).select(
          col("doc_id"),
          length(col("text")).cast("long").as("text_len"),
          size(toks).cast("long").as("n_words"),
          size(array_distinct(toks)).cast("long").as("n_distinct_words"),
          round(size(array_distinct(toks)).cast("double") / size(toks).cast("double"), 4)
            .as("ttr"),
          round((length(col("text")) - (size(toks) - 1)).cast("double") /
            size(toks).cast("double"), 4).as("avg_word_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, LENGTH(text) AS text_len,
             |  len(string_split(text,' ')) AS n_words,
             |  len(list_distinct(string_split(text,' '))) AS n_distinct_words,
             |  ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |        / len(string_split(text,' ')), 4) AS ttr,
             |  ROUND(CAST(LENGTH(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
             |        / len(string_split(text,' ')), 4) AS avg_word_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- X4 token counting, BPE-ish: greedy <=4-char alnum chunks via regex
    Q("x4_token_count",
      (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0)))
            .cast("long").as("n_subword_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, len(string_split(text,' ')) AS n_words,
             |  len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS n_subword_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- X4 language-ID: stopword-marker frequency heuristic, argmax with
    // fixed tie order (en > es > de). Deterministic and engine-neutral.
    Q("x4_langid",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        def hits(words: Seq[String]) =
          size(filter(toks, x => x.isin(words: _*))).cast("long")
        val en = hits(Seq("the", "a", "of", "and", "to"))
        val es = hits(Seq("el", "la", "de", "los", "y"))
        val de = hits(Seq("der", "die", "das", "und", "ein"))
        docs(s, dir).select(
          col("doc_id"), col("lang"),
          en.as("en_hits"), es.as("es_hits"), de.as("de_hits"),
          when(en >= es && en >= de, "en")
            .when(es >= de, "es")
            .otherwise("de").as("lang_pred"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  len(list_filter(string_split(text,' '),
             |      x -> x IN ('the','a','of','and','to'))) AS en_hits,
             |  len(list_filter(string_split(text,' '),
             |      x -> x IN ('el','la','de','los','y'))) AS es_hits,
             |  len(list_filter(string_split(text,' '),
             |      x -> x IN ('der','die','das','und','ein'))) AS de_hits,
             |  CASE
             |    WHEN len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to')))
             |         >= len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','los','y')))
             |     AND len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to')))
             |         >= len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ein')))
             |    THEN 'en'
             |    WHEN len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','los','y')))
             |         >= len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ein')))
             |    THEN 'es'
             |    ELSE 'de' END AS lang_pred
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- X4 document fingerprint (order-sensitive rolling hash; xxhash64 is
    // Spark-specific -> rows-only check, invariants asserted in TextSpec)
    Q("x4_fingerprint",
      (s, dir) =>
        docs(s, dir).select(col("doc_id"), TF.docFingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      None)
  )
}
