package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The SQL front door (Engine.registerTables): headline queries run
  * as `spark.sql` TEXT over the registered fixture views and match
  * their DataFrame twins ROW FOR ROW — including the decimal money
  * paths (same Catalyst expressions either way, so equality is exact,
  * not approximate) and the session extensions (native normalize
  * function, as-of marker + rewrite + native exec) reached purely
  * from SQL. */
class SqlFrontDoorSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("fixture views register and q2 pricing summary runs as SQL text") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    assert(rows(sql) == rows(queries.Q2Agg.run(spark, sf)))
  }

  test("q3 join chain with broadcast hints runs as SQL text") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      SELECT /*+ BROADCAST(supplier, nation, region) */ n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name ASC""")
    assert(rows(sql) == rows(queries.Q3JoinChain.run(spark, sf)))
  }

  test("q18 exact dedup runs as SQL text") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      SELECT md5(lower(text)) AS content_hash,
             min(doc_id) AS keeper_doc_id,
             count(*) AS n_copies,
             array_join(sort_array(collect_set(doc_id)), ' ') AS doc_ids
      FROM documents GROUP BY 1 ORDER BY keeper_doc_id""")
    assert(rows(sql) == rows(queries.Q18DedupExact.run(spark, sf)))
  }

  test("native normalize expression reached from SQL: mini inverted index") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      SELECT w AS word, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, graft_normalize_fast(tok) AS w
            FROM documents LATERAL VIEW explode(split(text, '\\s+')) AS tok)
      WHERE w != ''
      GROUP BY w ORDER BY df DESC, word LIMIT 20""")
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("doc_id"), expr("graft_normalize_fast(tok)").as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(20)
      .select(col("w").as("word"), col("df"))
    assert(rows(sql) == rows(df))
  }

  test("as-of join marker + native exec reached from SQL text") {
    val (purchases0, clicks) = queries.Q32AsofJoin.asofInputs(spark, sf)
    purchases0.select(col("user_id").as("p_user"), col("ts_us").as("pts"),
      col("pval")).createOrReplaceTempView("asof_purchases")
    clicks.createOrReplaceTempView("asof_clicks")
    try {
      val sql = spark.sql("""
        SELECT c.event_id, c.user_id, c.ts_us, c.click_value,
               p.pts AS purchase_ts_us, p.pval AS purchase_value,
               c.ts_us - p.pts AS gap_us
        FROM asof_clicks c LEFT JOIN asof_purchases p
          ON c.user_id = p.p_user AND graft_asof_le(p.pts, c.ts_us)
        ORDER BY c.event_id""")
      // The SQL text really went through the custom operator:
      assert(sql.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "expected AsofJoinExec in the SQL plan")
      assert(rows(sql) == rows(queries.Q32bAsofJoinNative.run(spark, sf)))
    } finally {
      spark.catalog.dropTempView("asof_purchases")
      spark.catalog.dropTempView("asof_clicks")
    }
  }

  test("q66 SCD2 build runs as SQL text (window change-detection chain)") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      WITH o AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      s AS (
        SELECT user_id, event_type, ts, event_id FROM o
        WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
        FROM s)
      SELECT user_id, version, event_type AS segment,
        unix_micros(ts) AS valid_from_us,
        unix_micros(valid_to) AS valid_to_us,
        (valid_to IS NULL) AS is_current
      FROM v ORDER BY user_id, version""")
    assert(rows(sql) == rows(queries.Q66Scd2Dimension.run(spark, sf)))
  }

  test("q67 RANGE frame runs as SQL text (numeric range window)") {
    Engine.registerTables(spark, sf)
    val sql = spark.sql("""
      WITH o AS (
        SELECT o_custkey, unix_micros(o_orderdate) AS od_us, o_orderkey,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders)
      SELECT o_custkey, od_us, o_orderkey,
        count(*) OVER w AS n_7d,
        CAST(SUM(price) OVER w AS DOUBLE) AS rev_7d
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY od_us
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, od_us, o_orderkey""")
    assert(rows(sql) == rows(queries.Q67RollingWindow.run(spark, sf)))
  }

  test("q25d banded near-dup join runs as SQL text over a registered hash view") {
    // The codec tier (mapPartitions PNG decode) can never be SQL
    // text; everything DOWNSTREAM of the hash frame can — banding
    // explode, bucket self-join, Hamming verify, top-k. Register the
    // feature frame and drive the whole join from SQL.
    import graft.multimodal.{Q25cImageFeatures, Q25dImageNearDup}
    Q25cImageFeatures.extractImageFeatures(
        Q25cImageFeatures.imageTable(spark, sf)).toDF()
      .select(col("media_id"), col("dhash"))
      .localCheckpoint() // one codec pass feeding both plans below
      .createOrReplaceTempView("image_hashes")
    val ham = Q25dImageNearDup.hammingExpr("ha", "hb")
    val sql = spark.sql(s"""
      WITH bands AS (
        SELECT media_id, dhash, bk.band AS band, bk.key AS key
        FROM image_hashes
        LATERAL VIEW explode(transform(sequence(0, 7),
          b -> named_struct('band', b,
            'key', substring(dhash, b * 2 + 1, 2)))) t AS bk),
      cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
          a.dhash AS ha, b.dhash AS hb
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.media_id < b.media_id)
      SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
      FROM cand ORDER BY hamming, id_a, id_b LIMIT ${Q25dImageNearDup.TopPairs}""")
    assert(rows(sql) == rows(Q25dImageNearDup.run(spark, sf)))
    spark.catalog.dropTempView("image_hashes")
  }


  test("q70 semantic dedup runs as SQL text through the native graft_dot") {
    // The WHOLE operator — norms, centroid seed, cosine argmax
    // assignment, within-cluster prune — as one SQL string, with the
    // injected native expression doing every dot product. The window
    // argmax (rn = 1, cos DESC, cid) must pick the same winner as the
    // DataFrame twin's max(struct(cos, -cid)): the doubles are
    // bit-equal (same graft_dot), so the orders agree.
    Engine.registerTables(spark, sf)
    import graft.queries.Q70SemanticDedup.{K, Tau}
    val sql = spark.sql(s"""
      WITH n2 AS (SELECT vec_id, embedding,
          graft_dot(embedding, embedding) AS n2 FROM embeddings),
      cent AS (SELECT vec_id AS cid, embedding AS ce, n2 AS cn2
               FROM n2 ORDER BY vec_id LIMIT $K),
      scored AS (SELECT v.vec_id, c.cid,
          graft_dot(v.embedding, c.ce) / (sqrt(v.n2) * sqrt(c.cn2)) AS cos
        FROM n2 v CROSS JOIN cent c),
      assign AS (SELECT vec_id, cluster FROM (
          SELECT vec_id, cid AS cluster,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      av AS (SELECT a.cluster, a.vec_id, n.embedding, n.n2
             FROM assign a JOIN n2 n ON n.vec_id = a.vec_id),
      doms AS (SELECT b.vec_id AS vb, min(a.vec_id) AS dom_id
               FROM av a JOIN av b
                 ON a.cluster = b.cluster AND a.vec_id < b.vec_id
               WHERE graft_dot(a.embedding, b.embedding)
                       / (sqrt(a.n2) * sqrt(b.n2)) >= $Tau
               GROUP BY b.vec_id)
      SELECT a.vec_id, a.cluster,
        CASE WHEN d.dom_id IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
        d.dom_id
      FROM assign a LEFT JOIN doms d ON d.vb = a.vec_id
      ORDER BY a.vec_id""")
    assert(rows(sql) == rows(queries.Q70SemanticDedup.run(spark, sf)))
  }

  test("q64b dictionary encode join runs as SQL text over a registered vocab view") {
    // Same split: the learn loop stays an engine operator; the
    // corpus-scale ENCODE (tokenize → normalize → dictionary join →
    // fertility) is plain SQL once the learned vocab is a view.
    Engine.registerTables(spark, sf)
    queries.Q64BpeMerges.learn(spark, sf)._2
      .select(col("word"), size(col("syms")).cast("long").as("ntok"))
      .createOrReplaceTempView("bpe_dict")
    val sql = spark.sql(s"""
      SELECT lang,
        count(DISTINCT doc_id) AS n_docs,
        count(*) AS total_words,
        sum(ntok) AS total_bpe_tokens,
        CAST(sum(ntok) AS DOUBLE) / count(*) AS fertility
      FROM (
        SELECT doc_id, lang, lower(regexp_replace(tok, '[^a-zA-Z]', '')) AS word
        FROM documents
        LATERAL VIEW explode(${queries.NorthStar.toksExpr}) t AS tok) w
      JOIN bpe_dict USING (word)
      WHERE length(word) > 0
      GROUP BY lang ORDER BY lang""")
    assert(rows(sql) == rows(queries.Q64bBpeEncode.run(spark, sf)))
    spark.catalog.dropTempView("bpe_dict")
  }
}
