package graft.queries

import graft.Engine
import graft.operators.{MatchPath, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** matchpath PTF + multimodal pipeline queries (SURVEY.md §2.5 table
  * functions and §7 custom work).
  */
object Advanced {

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  private val symbols: String => Char = {
    case "error" => 'e'
    case "purchase" => 'p'
    case "signup" => 's'
    case _ => 'x'
  }

  val all: Seq[Qd] = Seq(

    // matchpath with a 2-symbol adjacency pattern — SQL-expressible, so the
    // oracle checks the PTF result exactly (lead() formulation).
    Qd("q72_matchpath_adjacent",
      """WITH o AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
        |  FROM events)
        |SELECT user_id, event_id AS start_event, nid AS end_event
        |FROM o WHERE event_type = 'error' AND nxt = 'purchase'
        |ORDER BY user_id, start_event""") { (s, dir) =>
      MatchPath.matchPath(s, t(s, dir, "events"), symbols, "ep")
        .select(col("user_id"), col("start_event"), col("end_event"))
        .orderBy("user_id", "start_event")
    },

    // Greedy star pattern (signup → anything* → purchase). The regex
    // semantics (leftmost, non-overlapping, greedy) ARE oracle-expressible
    // for this alphabet: neither 's' nor 'p' is in [xe], so a match is
    // exactly "an s whose next non-[xe] symbol is a p" (greedy = maximal
    // x/e run by construction; matches can never overlap because a span's
    // interior is all x/e). The oracle finds each s's next blocking symbol
    // with a FOLLOWING-frame window min and reconstructs n_steps/sum_value
    // from row numbers and prefix sums.
    Qd("q73_matchpath_funnel",
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    CASE event_type WHEN 'error' THEN 'e' WHEN 'purchase' THEN 'p'
        |                    WHEN 'signup' THEN 's' ELSE 'x' END AS sym,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    sum(value)   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM events),
        |b AS (
        |  SELECT *,
        |    min(CASE WHEN sym IN ('s','p') THEN rn END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt_blk
        |  FROM e)
        |SELECT s.user_id, s.event_id AS start_event, t.event_id AS end_event,
        |  t.rn - s.rn + 1 AS n_steps,
        |  ROUND(t.cum - s.cum + s.value, 4) AS sum_value
        |FROM b s JOIN b t ON t.user_id = s.user_id AND t.rn = s.nxt_blk
        |WHERE s.sym = 's' AND t.sym = 'p'
        |ORDER BY s.user_id, start_event""") { (s, dir) =>
      MatchPath.matchPath(s, t(s, dir, "events"), symbols, "s[xe]*p")
        .select(col("user_id"), col("start_event"), col("end_event"),
          col("n_steps"), round(col("sum_value"), 4).as("sum_value"))
        .orderBy("user_id", "start_event")
    },

    // Multimodal: binary payload + metadata struct + partition-parallel
    // featurize (decode stubbed — see Multimodal.decodeStub). The stub's
    // byte histogram IS closed-form over an ASCII corpus: bin 6 counts
    // bytes 0x60..0x6F = the regexp class [`-o], and the float division
    // replays exactly as CAST(... AS FLOAT)/CAST(... AS FLOAT) (IEEE
    // float32 on both engines), so the oracle hash-checks the full
    // featurize pass instead of a rows-only waiver.
    Qd("q74_multimodal_features",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT)+1] AS kind,
        |    strlen(text) AS nb,
        |    strlen(text) - strlen(regexp_replace(text, '[`-o]', '', 'g')) AS k6
        |  FROM documents)
        |SELECT media_id, kind, CAST(nb AS BIGINT) AS n_bytes,
        |  CASE WHEN nb = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE ROUND(CAST(CAST(k6 AS FLOAT) / CAST(nb AS FLOAT) AS DOUBLE), 6)
        |  END AS bin6,
        |  CAST(LEAST(8, nb) AS INT) AS sample_len
        |FROM m ORDER BY media_id""") { (s, dir) =>
      val media = Multimodal.mediaTable(t(s, dir, "documents"))
      Multimodal.extractFeatures(s, media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("feature"), 7).cast("double"), 6).as("bin6"),
          length(col("frame_sample")).as("sample_len"))
        .orderBy("media_id")
    },

    // Multimodal resize + frame-sample plumbing (stub codec): byte counts
    // and frame counts are deterministic, so the oracle checks the real
    // partition-parallel pipeline arithmetic.
    Qd("q103_multimodal_resize",
      """WITH m AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT)+1] AS kind,
        |    strlen(text) AS nb
        |  FROM documents)
        |SELECT kind, count(*) AS n_media,
        |  CAST(sum(CAST(ceil(CAST(nb AS DOUBLE)/4) AS BIGINT)) AS BIGINT) AS rz_bytes,
        |  CAST(sum(least(5, CAST(floor((nb-1)/16) AS BIGINT)+1)) AS BIGINT) AS n_frames
        |FROM m GROUP BY kind ORDER BY kind""") { (s, dir) =>
      val media = Multimodal.mediaTable(t(s, dir, "documents"))
      val rz = Multimodal.resize(media, 4)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(length(col("payload")).cast("bigint")).as("rz_bytes"))
      val fr = Multimodal.frameSample(media, 16, 5)
        .groupBy(col("kind").as("fkind"))
        .agg(count(lit(1)).as("n_frames"))
      rz.join(fr, col("kind") === col("fkind"))
        .select(col("kind"), col("n_media"), col("rz_bytes"), col("n_frames"))
        .orderBy("kind")
    },

    // REAL image decode ([[Multimodal.imageTable]] writes actual PNG files,
    // [[Multimodal.decodeImageStats]] decodes them with ImageIO in a
    // compiled mapPartitions pass). The oracle needs no codec: the images
    // are generated from a closed-form pixel function of (id, x, y), and
    // PNG is lossless, so DuckDB recomputes the decoded dims, per-channel
    // sums, and the position-weighted checksum from the arithmetic alone —
    // a full hash check of the decode kernel, not a rows-only waiver.
    Qd("q263_image_decode",
      """WITH m AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 400),
        |px AS (
        |  SELECT doc_id, w, h, i % w AS x, i // w AS y
        |  FROM (SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS i FROM m)),
        |s AS (
        |  SELECT doc_id, w, h,
        |    SUM((31*doc_id + 7*x + 13*y) % 256) AS r_sum,
        |    SUM((17*doc_id + 5*x + 11*y) % 256) AS g_sum,
        |    SUM((23*doc_id + 3*x + 19*y) % 256) AS b_sum,
        |    SUM((1 + x + y*w) * ((31*doc_id + 7*x + 13*y) % 256
        |       + (17*doc_id + 5*x + 11*y) % 256
        |       + (23*doc_id + 3*x + 19*y) % 256)) AS wsum
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id AS media_id, 'ok' AS status,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(r_sum AS BIGINT) AS r_sum, CAST(g_sum AS BIGINT) AS g_sum,
        |  CAST(b_sum AS BIGINT) AS b_sum, CAST(wsum AS BIGINT) AS wsum
        |FROM s ORDER BY media_id""") { (s, dir) =>
      val media = Multimodal.imageTable(
        t(s, dir, "documents").filter(col("doc_id") < 400))
      Multimodal.decodeImageStats(media)
        .select(col("media_id"), col("status"), col("width"), col("height"),
          col("channels"), col("r_sum"), col("g_sum"), col("b_sum"),
          col("wsum"))
        .orderBy("media_id")
    },

    // Corrupt-image tolerance (PERMISSIVE rescue discipline, q258-style):
    // payloads of every 50th media row are replaced with undecodable junk;
    // the decode NEVER fails the job — corrupt rows survive with
    // status='corrupt' and NULL stats, healthy rows are untouched.
    Qd("q264_image_decode_rescue",
      """WITH m AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 400),
        |px AS (
        |  SELECT doc_id, w, h, i % w AS x, i // w AS y
        |  FROM (SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS i FROM m)
        |  WHERE doc_id % 50 <> 0),
        |s AS (
        |  SELECT doc_id,
        |    SUM((31*doc_id + 7*x + 13*y) % 256) AS r_sum
        |  FROM px GROUP BY 1)
        |SELECT m.doc_id AS media_id,
        |  CASE WHEN m.doc_id % 50 = 0 THEN 'corrupt' ELSE 'ok' END AS status,
        |  CAST(CASE WHEN m.doc_id % 50 = 0 THEN NULL ELSE m.w END AS INT) AS width,
        |  CAST(CASE WHEN m.doc_id % 50 = 0 THEN NULL ELSE m.h END AS INT) AS height,
        |  CAST(s.r_sum AS BIGINT) AS r_sum
        |FROM m LEFT JOIN s ON s.doc_id = m.doc_id
        |ORDER BY media_id""") { (s, dir) =>
      val junk = lit("not-an-image-0123456789abcdef".getBytes("UTF-8"))
      val media = Multimodal.imageTable(
          t(s, dir, "documents").filter(col("doc_id") < 400))
        .withColumn("payload",
          when(col("media_id") % 50 === 0, junk).otherwise(col("payload")))
      Multimodal.decodeImageStats(media)
        .select(col("media_id"), col("status"), col("width"), col("height"),
          col("r_sum"))
        .orderBy("media_id")
    },

    // REAL audio decode ([[Multimodal.audioTable]] writes actual WAV files
    // — 8-bit unsigned mono PCM from a closed-form sample function — and
    // [[Multimodal.decodeAudioStats]] decodes them with javax.sound).
    // PCM-in-WAV is lossless, so the oracle recomputes sample count, sum,
    // and the position-weighted checksum from arithmetic alone; the image
    // (q263) + audio (q280) pair covers both real decode modalities the
    // JDK ships codecs for.
    Qd("q280_audio_decode",
      """WITH m AS (SELECT doc_id, 64 + doc_id % 65 AS n
        |  FROM documents WHERE doc_id < 400),
        |sm AS (
        |  SELECT doc_id, n,
        |    SUM((37*doc_id + 11*t) % 256) AS s_sum,
        |    SUM((t + 1) * ((37*doc_id + 11*t) % 256)) AS wsum
        |  FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM m)
        |  GROUP BY doc_id, n)
        |SELECT doc_id AS media_id, 'ok' AS status,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(s_sum AS BIGINT) AS s_sum, CAST(wsum AS BIGINT) AS wsum
        |FROM sm ORDER BY media_id""") { (s, dir) =>
      val media = Multimodal.audioTable(
        t(s, dir, "documents").filter(col("doc_id") < 400))
      Multimodal.decodeAudioStats(media)
        .select(col("media_id"), col("status"), col("sample_rate"),
          col("channels"), col("n_samples"), col("s_sum"), col("wsum"))
        .orderBy("media_id")
    },

    // PointLookupOptimizer (OR-chain → IN) — injected rule; rewrite asserted
    // in ExtensionSpec, result checked here.
    Qd("q89_point_lookup",
      """SELECT l_linenumber, count(*) AS n, sum(l_quantity) AS sq
        |FROM lineitem
        |WHERE l_linenumber = 1 OR l_linenumber = 2 OR l_linenumber = 3
        |   OR l_linenumber = 4
        |GROUP BY l_linenumber ORDER BY l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1 || col("l_linenumber") === 2 ||
          col("l_linenumber") === 3 || col("l_linenumber") === 4)
        .groupBy("l_linenumber")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"))
        .orderBy("l_linenumber")
    },

    // matchpath as a first-class Catalyst operator (logical node + strategy
    // + UnaryExecNode via GraftExtensions) — same oracle as the
    // flatMapGroups q72 variant.
    Qd("q90_matchpath_operator",
      """WITH o AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
        |  FROM events)
        |SELECT user_id, event_id AS start_event, nid AS end_event
        |FROM o WHERE event_type = 'error' AND nxt = 'purchase'
        |ORDER BY user_id, start_event""") { (s, dir) =>
      graft.plans.MatchPathPlan(t(s, dir, "events"),
          Map("error" -> "e", "purchase" -> "p", "signup" -> "s"), "ep")
        .select(col("user_id"), col("start_event"), col("end_event"))
        .orderBy("user_id", "start_event")
    },

    // AS-OF join ([[graft.operators.AsofJoin]] — the point-in-time join
    // the reference lacks; DuckDB's native ASOF JOIN is the oracle): for
    // every click, the latest purchase by the same user at or before it
    // (ties inclusive), left-outer. The union-and-carry implementation
    // must agree with the oracle's sort-merge on every user including
    // never-purchased ones (NULL match) and equal-timestamp ties.
    Qd("q213_asof_join",
      """WITH ev AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type, value
        |  FROM events),
        |c AS (SELECT event_id, user_id, tsec FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, tsec AS ptsec, arg_max(value, event_id) AS pvalue
        |      FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.tsec, p.ptsec AS matched_ptsec, p.pvalue
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsec >= p.ptsec
        |ORDER BY c.event_id""") { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"), col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "tsec")
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "tsec")
        .agg(max(struct(col("event_id"), col("value"))).as("r"))
        .select(col("user_id"), col("tsec").as("ptsec"),
          col("r.value").as("pvalue"))
      graft.operators.AsofJoin.asofJoin(clicks, purch,
          keys = Seq("user_id"), leftTs = "tsec", rightTs = "ptsec")
        .select("event_id", "user_id", "tsec", "matched_ptsec", "pvalue")
        .orderBy("event_id")
    },

    // Range join via interval binning ([[graft.operators.RangeJoin]]): how
    // many same-user purchase windows (±30 min) contain each click. The
    // bare BETWEEN join has no equi-condition and would nested-loop; the
    // binned form is a plain shuffled equi-join on (user, bin) with an
    // exact bounds re-check — each pair meets exactly once, so the counts
    // match the oracle's naive inequality join row for row.
    Qd("q214_range_join_binned",
      """WITH ev AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type FROM events),
        |c AS (SELECT event_id, user_id, tsec FROM ev WHERE event_type = 'click'),
        |w AS (SELECT user_id, event_id AS pid, tsec - 1800 AS lo, tsec + 1800 AS hi
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, CAST(count(w.pid) AS BIGINT) AS n_windows
        |FROM c LEFT JOIN w ON c.user_id = w.user_id AND c.tsec BETWEEN w.lo AND w.hi
        |GROUP BY 1, 2 ORDER BY c.event_id""") { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "tsec")
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          (col("tsec") - 1800).as("lo"), (col("tsec") + 1800).as("hi"))
      val hits = graft.operators.RangeJoin.pointInInterval(clicks, windows,
          keys = Seq("user_id"), pointTs = "tsec", lo = "lo", hi = "hi",
          binWidth = 3600L)
        .groupBy("event_id", "user_id").agg(count(lit(1)).as("n"))
      clicks.join(hits, Seq("event_id", "user_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n"), lit(0L)).as("n_windows"))
        .orderBy("event_id")
    },

    // Gap fill + forward fill ([[graft.operators.TimeFill]] — the
    // time_bucket_gapfill/locf resampling step): each user's sparse hourly
    // click sums densify to every hour between their first and last
    // activity, observed hours keep their sum, gap hours read NULL with
    // the last observation carried forward. The oracle builds the same
    // spine with generate_series and IGNORE NULLS last_value.
    Qd("q215_gapfill_ffill",
      """WITH ev AS (SELECT user_id,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hb, value
        |  FROM events WHERE event_type = 'click'),
        |h AS (SELECT user_id, hb, round(sum(value), 4) AS sv FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(hb) AS lo, max(hb) AS hi FROM h GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS hb
        |          FROM bounds),
        |j AS (SELECT s.user_id, s.hb, h.sv FROM spine s
        |      LEFT JOIN h USING (user_id, hb))
        |SELECT user_id, hb, sv,
        |  last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hb
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_ffill
        |FROM j ORDER BY user_id, hb""") { (s, dir) =>
      val hourly = t(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("user_id"),
          expr("(unix_timestamp(ts) DIV 3600) * 3600").as("hb"), col("value"))
        .groupBy("user_id", "hb").agg(round(sum("value"), 4).as("sv"))
      graft.operators.TimeFill.gapFillForward(hourly,
          keys = Seq("user_id"), bucket = "hb", step = 3600L,
          valueCols = Seq("sv"))
        .select("user_id", "hb", "sv", "sv_ffill")
        .orderBy("user_id", "hb")
    },

    // Fixed-point PageRank ([[graft.operators.PageRank]] — exact integer
    // micro-unit arithmetic, one join+agg per iteration, bounded
    // two-generation lineage) over the customer→supplier purchase graph.
    // The oracle replays the SAME recurrence as three chained CTEs —
    // because every step is non-negative integer math, truncating (Spark
    // DIV) and flooring (DuckDB //) division coincide and the ranks are
    // bit-equal after 3 iterations, no tolerance anywhere.
    Qd("q247_pagerank",
      """WITH e AS (SELECT DISTINCT o.o_custkey AS src,
        |            l.l_suppkey + 1000000 AS dst
        |       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |n AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
        |s1 AS (SELECT e.dst AS v, CAST(sum(r0.r // d.deg) AS BIGINT) AS s
        |       FROM e JOIN r0 ON e.src = r0.v JOIN d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(s1.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN s1 ON n.v = s1.v),
        |s2 AS (SELECT e.dst AS v, CAST(sum(r1.r // d.deg) AS BIGINT) AS s
        |       FROM e JOIN r1 ON e.src = r1.v JOIN d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(s2.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN s2 ON n.v = s2.v),
        |s3 AS (SELECT e.dst AS v, CAST(sum(r2.r // d.deg) AS BIGINT) AS s
        |       FROM e JOIN r2 ON e.src = r2.v JOIN d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(s3.s, 0)) // 1000000 AS BIGINT) AS r
        |       FROM n LEFT JOIN s3 ON n.v = s3.v)
        |SELECT v, r FROM r3 ORDER BY v""") { (s, dir) =>
      val edges = t(s, dir, "orders").as("o")
        .join(t(s, dir, "lineitem").as("l"),
          col("o.o_orderkey") === col("l.l_orderkey"))
        .select(col("o.o_custkey").cast("long").as("src"),
          (col("l.l_suppkey").cast("long") + 1000000L).as("dst"))
      graft.operators.PageRank.run(edges, iters = 3).orderBy("v")
    },

    // OHLC bar resampling — the time-series downsampling staple (open/
    // high/low/close/volume per 6-hour bucket per user). Spark-first: ONE
    // aggregation with `min_by`/`max_by` over the (ts, event_id) order
    // struct — map-side partial-aggregated, no window, no sort — where
    // the classic formulation (and the oracle) runs TWO full window sorts
    // just to find each bucket's first and last row. Open/high/low/close
    // are raw stored doubles (bit-identical cross-engine); only the
    // volume sum is rounded.
    Qd("q255_ohlc_resample",
      """WITH b AS (SELECT user_id,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 21600) * 21600 AS bk,
        |    ts, event_id, value FROM events),
        |r AS (SELECT user_id, bk, value,
        |   row_number() OVER (PARTITION BY user_id, bk
        |     ORDER BY ts, event_id) AS rn_a,
        |   row_number() OVER (PARTITION BY user_id, bk
        |     ORDER BY ts DESC, event_id DESC) AS rn_d
        |   FROM b)
        |SELECT user_id, bk,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS n, ROUND(sum(value), 4) AS vol
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"),
          (expr("unix_timestamp(ts) DIV 21600") * 21600).as("bk"),
          struct(col("ts"), col("event_id")).as("ord"), col("value"))
        .groupBy("user_id", "bk")
        .agg(min_by(col("value"), col("ord")).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), col("ord")).as("close"),
          count(lit(1)).as("n"), round(sum("value"), 4).as("vol"))
        .orderBy("user_id", "bk")
    }
  )
}
