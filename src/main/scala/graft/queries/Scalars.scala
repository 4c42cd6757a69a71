package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Scalar-function operators: string / date / math / json / array / map /
  * explode (SURVEY.md §2.7).
  *
  * Everything here is a per-row projection over builtin (codegen'd)
  * functions — no UDFs in the hot path, so each query stays inside one
  * WholeStageCodegen span fused with the scan. Dialect drift vs DuckDB
  * (arg order, return types, 1-based indexing) is resolved per function
  * in the oracle SQL (SURVEY §7.4 R5); int-typed outputs are cast to the
  * same width on both sides.
  */
object Scalars {

  val qs: Seq[Q] = Seq(
    Q("fn_string",
      (s, d) => part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_type")).as("type_lower"),
        substring(col("p_name"), 1, 5).as("name_head"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        expr("replace(p_type, ' ', '_')").as("type_snake"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        expr("split_part(p_type, ' ', 1)").as("type_first"),
        trim(col("p_name")).as("name_trim"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
                upper(p_name) AS name_upper,
                lower(p_type) AS type_lower,
                substring(p_name, 1, 5) AS name_head,
                p_brand || '#' || p_type AS brand_type,
                CAST(length(p_name) AS INT) AS name_len,
                replace(p_type, ' ', '_') AS type_snake,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                split_part(p_type, ' ', 1) AS type_first,
                trim(p_name) AS name_trim
         FROM part ORDER BY p_partkey"""),

    // regex surface beyond the single extract in fn_string: capture
    // groups, global replace, boolean match, match count
    Q("fn_regex",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)-(.+)$", 1)
          .cast("int").as("prio_num"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)-(.+)$", 2)
          .as("prio_word"),
        regexp_replace(col("o_orderpriority"), "[AEIOU]", "_")
          .as("prio_masked"),
        col("o_orderpriority").rlike("^[12]-").cast("int").as("is_urgent"),
        expr("regexp_count(o_orderpriority, '[A-Z]')").cast("int")
          .as("n_upper"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                CAST(regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 1)
                  AS INT) AS prio_num,
                regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 2)
                  AS prio_word,
                regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g')
                  AS prio_masked,
                CAST(regexp_matches(o_orderpriority, '^[12]-') AS INT)
                  AS is_urgent,
                CAST(len(regexp_extract_all(o_orderpriority, '[A-Z]'))
                  AS INT) AS n_upper
         FROM orders ORDER BY o_orderkey"""),

    // nested struct columns: build, access fields, compare — emitted as
    // scalar columns (raw struct output would be comparator-hostile)
    Q("fn_struct",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          struct(col("o_custkey").as("cust"),
            col("o_totalprice").as("price")).as("o"))
        .select(col("o_orderkey"),
          col("o.cust").as("cust"),
          col("o.price").as("price"),
          (col("o.price") > 200000).cast("int").as("is_big"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o.cust AS cust, o.price AS price,
                CAST(o.price > 200000 AS INT) AS is_big
         FROM (SELECT o_orderkey,
                 {'cust': o_custkey, 'price': o_totalprice} AS o
               FROM orders)
         ORDER BY o_orderkey"""),

    Q("fn_date",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        col("o_orderdate").cast("date").as("order_date"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("epoch_s"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS dom,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                  AS month_start,
                CAST(date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS INT) AS days_since,
                CAST(o_orderdate AS DATE) + 30 AS due_date,
                CAST(o_orderdate AS DATE) AS order_date,
                epoch_us(o_orderdate) // 1000000 AS epoch_s
         FROM orders ORDER BY o_orderkey"""),

    // round() is applied only to irrational outputs (sqrt/ln) — rounding
    // a 2-decimal price hits half-tie divergence between engines (R4).
    Q("fn_math",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        abs(col("o_totalprice") - 200000).as("abs_diff"),
        ceil(col("o_totalprice")).as("price_ceil"),
        floor(col("o_totalprice")).as("price_floor"),
        round(sqrt(col("o_totalprice")), 4).as("price_sqrt"),
        round(log(col("o_totalprice")), 4).as("price_ln"),
        (col("o_orderkey") % 7).as("key_mod"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                abs(o_totalprice - 200000) AS abs_diff,
                CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
                CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
                round(sqrt(o_totalprice), 4) AS price_sqrt,
                round(ln(o_totalprice), 4) AS price_ln,
                o_orderkey % 7 AS key_mod
         FROM orders ORDER BY o_orderkey"""),

    // edit distance — the fuzzy-matching primitive record-linkage
    // pipelines use; both engines implement classic Levenshtein
    Q("fn_editdist",
      (s, d) => part(s, d).select(
        col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("name_type_dist"),
        levenshtein(col("p_brand"), lit("Brand#00")).as("brand_dist"),
        levenshtein(substring(col("p_name"), 1, 10),
          substring(col("p_type"), 1, 10)).as("head_dist"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
                CAST(levenshtein(p_name, p_type) AS INT) AS name_type_dist,
                CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS brand_dist,
                CAST(levenshtein(substring(p_name, 1, 10),
                                 substring(p_type, 1, 10)) AS INT)
                  AS head_dist
         FROM part ORDER BY p_partkey"""),

    // bitwise surface: shifts, and/or/xor, popcount — the building
    // blocks the SimHash/bucketing verbs use, exposed as a declared op
    Q("fn_bitwise",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        expr("shiftleft(o_orderkey, 3)").as("shl3"),
        expr("shiftright(o_orderkey, 2)").as("shr2"),
        expr("o_orderkey & 255").as("low_byte"),
        expr("o_orderkey | 1").as("set_lsb"),
        expr("o_orderkey ^ 21845").as("xor_pattern"),
        expr("bit_count(o_orderkey)").cast("int").as("popcount"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                o_orderkey << 3 AS shl3,
                o_orderkey >> 2 AS shr2,
                o_orderkey & 255 AS low_byte,
                o_orderkey | 1 AS set_lsb,
                xor(o_orderkey, 21845) AS xor_pattern,
                CAST(bit_count(o_orderkey) AS INT) AS popcount
         FROM orders ORDER BY o_orderkey"""),

    // positional explode: token + its 0-based position (DuckDB unnests
    // the value list and a range list in lockstep)
    Q("fn_posexplode",
      (s, d) => documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .orderBy("doc_id", "pos"),
      """SELECT doc_id,
                unnest(range(0, len(string_split(text, ' ')))) AS pos,
                unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id < 100
         ORDER BY doc_id, pos"""),

    Q("fn_json",
      (s, d) => events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy("event_id"),
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events ORDER BY event_id"""),

    // Array ops over the 64-dim embedding column: size / element_at /
    // slice / higher-order transform+aggregate (L2 norm). The fold is
    // left-associative with a +0.0 init in Spark and pairwise-left in
    // DuckDB — identical double results since 0+x is exact.
    // The sliced head is emitted as scalar columns (not a raw list —
    // list columns are unhashable in the driver's pandas comparator).
    Q("fn_array",
      (s, d) => embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(slice(col("embedding"), 1, 4), 2).as("head_2"),
        element_at(slice(col("embedding"), 1, 4), 3).as("head_3"),
        element_at(slice(col("embedding"), 1, 4), 4).as("head_4"),
        expr("""round(sqrt(aggregate(transform(embedding,
                  x -> cast(x AS double) * cast(x AS double)),
                0D, (a, x) -> a + x)), 4)""").as("l2_norm"))
        .orderBy("vec_id"),
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dim,
                embedding[1] AS first_val,
                (embedding[1:4])[2] AS head_2,
                (embedding[1:4])[3] AS head_3,
                (embedding[1:4])[4] AS head_4,
                round(sqrt(list_reduce(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (a, x) -> a + x)), 4) AS l2_norm
         FROM embeddings ORDER BY vec_id"""),

    // Build a per-user event_type→count map, then look it up. The map is
    // assembled from a deterministically sorted entry list; the oracle
    // checks the scalar lookups.
    Q("fn_map",
      (s, d) => events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("event_type"), col("n")))))
          .as("type_counts"))
        .select(
          col("user_id"),
          coalesce(element_at(col("type_counts"), "click"), lit(0L))
            .as("clicks"),
          size(col("type_counts")).as("n_types"))
        .orderBy("user_id"),
      """SELECT user_id,
                COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
                CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
         FROM events GROUP BY user_id ORDER BY user_id"""),

    // dimension-table generation: a date spine (calendar rows from
    // nothing) — sequence+explode in Spark, generate_series in DuckDB
    Q("gen_date_spine",
      (s, d) => s.range(1)
        .select(explode(expr(
          "sequence(DATE '1995-01-01', DATE '1995-12-31', interval 1 day)"))
          .as("cal_date"))
        .select(col("cal_date"),
          year(col("cal_date")).as("y"),
          month(col("cal_date")).as("m"),
          dayofweek(col("cal_date")).as("dow"))
        .orderBy("cal_date"),
      """SELECT CAST(gs AS DATE) AS cal_date,
                CAST(year(gs) AS INT) AS y,
                CAST(month(gs) AS INT) AS m,
                CAST(dayofweek(gs) AS INT) + 1 AS dow
         FROM generate_series(DATE '1995-01-01', DATE '1995-12-31',
                              INTERVAL 1 DAY) t(gs)
         ORDER BY cal_date"""),

    // deterministic hash/encoding utilities (identical digests in any
    // engine — the basis of reproducible sampling and fingerprints)
    Q("fn_hash",
      (s, d) => part(s, d).select(
        col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"),
        base64(col("p_name").cast("binary")).as("b64"),
        lower(hex(col("p_name").cast("binary"))).as("name_hex"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
                md5(p_name) AS h_md5,
                sha256(p_name) AS h_sha256,
                to_base64(CAST(p_name AS BLOB)) AS b64,
                lower(hex(CAST(p_name AS BLOB))) AS name_hex
         FROM part ORDER BY p_partkey"""),

    Q("fn_explode",
      (s, d) => documents(s, d).select(
        col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word"),
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
         FROM documents ORDER BY doc_id, word"""),

    // URL decomposition via parse_url. The URLs are synthesized from
    // table columns, so the oracle rebuilds each component from the
    // same parts — checking the parser against construction-time truth
    // (DuckDB has no parse_url to mirror).
    Q("fn_url",
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc?id="), col("doc_id"), lit("&n="),
            col("n_chars")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'n')").as("q_n"))
        .orderBy("doc_id"),
      """SELECT doc_id,
                'https' AS proto,
                source || '.example.com' AS host,
                '/' || lang || '/doc' AS path,
                'id=' || doc_id || '&n=' || n_chars AS query,
                CAST(n_chars AS VARCHAR) AS q_n
         FROM documents ORDER BY doc_id"""),

    // DETERMINISTIC content-addressed UUIDs (the v5/name-based shape):
    // stable surrogate keys minted from business content, so the same
    // entity gets the same id on every run, every engine, every retry —
    // what rand-based uuid() can never give an idempotent pipeline.
    // Digest = md5 of the canonical key string; the UUID text form is
    // sliced from the hex with version/variant nibbles pinned (version
    // 5 in the third group, variant '8' in the fourth) — pure string
    // ops, identical both engines.
    Q("fn_uuid_v5",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        concat_ws("-",
          substring(md5(concat(lit("order:"),
            col("o_orderkey").cast("string"))), 1, 8),
          substring(md5(concat(lit("order:"),
            col("o_orderkey").cast("string"))), 9, 4),
          concat(lit("5"), substring(md5(concat(lit("order:"),
            col("o_orderkey").cast("string"))), 14, 3)),
          concat(lit("8"), substring(md5(concat(lit("order:"),
            col("o_orderkey").cast("string"))), 18, 3)),
          substring(md5(concat(lit("order:"),
            col("o_orderkey").cast("string"))), 21, 12)).as("entity_uuid"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                concat_ws('-',
                  substring(md5('order:' || o_orderkey), 1, 8),
                  substring(md5('order:' || o_orderkey), 9, 4),
                  '5' || substring(md5('order:' || o_orderkey), 14, 3),
                  '8' || substring(md5('order:' || o_orderkey), 18, 3),
                  substring(md5('order:' || o_orderkey), 21, 12))
                  AS entity_uuid
         FROM orders ORDER BY o_orderkey"""),

    // GEOMETRIC MEAN per group via exp∘mean∘ln — the aggregate for
    // multiplicative quantities (growth factors, ratios) where the
    // arithmetic mean is simply wrong. Neither engine has a builtin;
    // both compose it the same way: ln of identical doubles, pinned to
    // DECIMAL(18,9) so the sum is order-free, one exp on the identical
    // mean, rounded once.
    Q("agg_geomean",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(exp(sum(log(col("l_extendedprice"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
            .cast("double") / count(lit(1))), 4).as("geo_mean_price"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, COUNT(*) AS n,
                ROUND(exp(CAST(SUM(CAST(ln(l_extendedprice)
                    AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)), 4)
                  AS geo_mean_price
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),

    // HARMONIC mean — the third Pythagorean mean (rate averaging:
    // "mean price per unit" style); completes the geomean pattern with
    // the same discipline: per-row reciprocals pinned to
    // DECIMAL(18,12) (order-free Σ), one closed-form double division
    // at the end, rounded once. Same single partial-agg exchange.
    Q("agg_harmonic_mean",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(count(lit(1)) /
            sum((lit(1.0) / col("l_extendedprice"))
              .cast(org.apache.spark.sql.types.DecimalType(18, 12)))
              .cast("double"), 4).as("harmonic_mean_price"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, COUNT(*) AS n,
                ROUND(COUNT(*) / CAST(SUM(CAST(
                    CAST(1.0 AS DOUBLE) / l_extendedprice
                    AS DECIMAL(18,12))) AS DOUBLE), 4)
                  AS harmonic_mean_price
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),

    // regexp_extract_all — pull EVERY match out of semi-structured
    // text (the extraction dual of text_pii_mask's redaction): contact
    // lines with a deterministic email + two id tokens are synthesized
    // per customer, and all id-like tokens come back as ordered scalar
    // columns (arrays are unhashable in the driver comparator).
    Q("text_extract_entities",
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        concat(lit("contact user"), col("c_custkey"),
          lit("@example.com ref ID-"), col("c_custkey") % 97,
          lit(" and ID-"), col("c_custkey") % 31).as("line"))
        .select(col("c_custkey"),
          expr("regexp_extract(line, '([a-z0-9]+@[a-z.]+)', 1)")
            .as("email"),
          expr("element_at(regexp_extract_all(line, 'ID-([0-9]+)', 1), 1)")
            .as("id_first"),
          expr("element_at(regexp_extract_all(line, 'ID-([0-9]+)', 1), 2)")
            .as("id_second"),
          expr("size(regexp_extract_all(line, 'ID-([0-9]+)', 1))")
            .cast("long").as("n_ids"))
        .orderBy("c_custkey"),
      """WITH t AS (
           SELECT c_custkey,
                  'contact user' || c_custkey || '@example.com ref ID-'
                    || (c_custkey % 97) || ' and ID-' || (c_custkey % 31)
                    AS line
           FROM customer)
         SELECT c_custkey,
                regexp_extract(line, '([a-z0-9]+@[a-z.]+)', 1) AS email,
                regexp_extract_all(line, 'ID-([0-9]+)', 1)[1] AS id_first,
                regexp_extract_all(line, 'ID-([0-9]+)', 1)[2] AS id_second,
                CAST(len(regexp_extract_all(line, 'ID-([0-9]+)', 1))
                  AS BIGINT) AS n_ids
         FROM t ORDER BY c_custkey"""),

    // Built-in data MASKING (Spark's mask()): the column-level redaction
    // verb for showing data shape without content — upper→X, lower→x,
    // digit→n, other preserved — plus a custom-char variant. The
    // class-preserving property is what distinguishes it from
    // text_pii_mask's pattern redaction: a masked value still validates
    // format rules downstream. DuckDB mirrors with the equivalent
    // per-class regexp_replace chain ('g'), checking Spark's builtin
    // against the spelled-out semantics.
    Q("fn_mask",
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        expr("mask(c_name)").as("masked_default"),
        expr("mask(c_name, '#', '*', '0')").as("masked_custom"),
        expr("mask(c_mktsegment, 'U', 'l', 'd', '-')").as("masked_all"))
        .orderBy("c_custkey"),
      """SELECT c_custkey,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
                  'g') AS masked_default,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '0',
                  'g') AS masked_custom,
                regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(c_mktsegment,
                  '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', 'd',
                  'g'), '[^Ulld]', '-', 'g') AS masked_all
         FROM customer ORDER BY c_custkey"""),

    // ANSI-mode SURVIVABLE arithmetic (try_add / try_subtract /
    // try_multiply / try_divide): Spark 4 runs ANSI by default, so
    // plain arithmetic THROWS on overflow and division by zero — one
    // poison row kills a 100 TB job. The try_ family quarantines to
    // NULL instead (the arithmetic twin of conform_trycast). Overflow
    // is planted near Long.MaxValue and at 2^62 so both directions
    // trip; DuckDB (which widens to HUGEINT instead of overflowing)
    // mirrors with the construction-rule CASE — the oracle checks the
    // null pattern matches the planted rule exactly.
    Q("fn_try_arith",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        expr("try_add(9223372036854775807 - 5000, o_orderkey)")
          .as("add_guarded"),
        expr("try_multiply(o_orderkey, 4611686018427387904L)")
          .as("mul_guarded"),
        expr("try_divide(o_totalprice, o_orderkey % 3)")
          .as("div_guarded"),
        expr("try_subtract(-9223372036854775807 + 5000, o_orderkey)")
          .as("sub_guarded"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                CASE WHEN o_orderkey <= 5000
                     THEN 9223372036854775807 - 5000 + o_orderkey END
                  AS add_guarded,
                CASE WHEN o_orderkey <= 1
                     THEN o_orderkey * 4611686018427387904 END
                  AS mul_guarded,
                CASE WHEN o_orderkey % 3 <> 0
                     THEN o_totalprice / (o_orderkey % 3) END
                  AS div_guarded,
                CASE WHEN o_orderkey <= 5001
                     THEN -9223372036854775807 + 5000 - o_orderkey END
                  AS sub_guarded
         FROM orders ORDER BY o_orderkey"""),

    // Spark 4 COLLATION surface: UTF8_LCASE makes comparison/grouping
    // case-insensitive AT THE TYPE LEVEL — the engine-native form of
    // "wrap everything in lower()" (which breaks pushdown and index
    // use). Mixed-case status values are planted deterministically;
    // grouping on the collated column merges the case variants, and
    // the emitted group label is lower()ed on both sides so the
    // representative is deterministic. DuckDB mirrors with lower()
    // grouping — same relation, different mechanism, which is the
    // point: collation is Spark's declarative route to it.
    Q("fn_collate",
      (s, d) => orders(s, d)
        .select(when(col("o_orderkey") % 2 === 0,
            upper(col("o_orderpriority")))
          .otherwise(lower(col("o_orderpriority"))).as("pri_mixed"))
        .groupBy(expr("collate(pri_mixed, 'UTF8_LCASE')").as("pri_ci"))
        .agg(count(lit(1)).as("n"))
        .select(lower(col("pri_ci")).as("pri"), col("n"))
        .orderBy("pri"),
      """SELECT lower(pri_mixed) AS pri, COUNT(*) AS n
         FROM (SELECT CASE WHEN o_orderkey % 2 = 0
                           THEN upper(o_orderpriority)
                           ELSE lower(o_orderpriority) END AS pri_mixed
               FROM orders)
         GROUP BY 1 ORDER BY pri"""),

    // Spark 4 VARIANT — the semi-structured column type that replaces
    // schema-on-read JSON string re-parsing: parse once into the binary
    // variant encoding, then typed path extraction (variant_get) without
    // per-access string parsing. At 100 TB the difference is real: a
    // variant column stores the parsed tree (with shredding in parquet),
    // so N path extractions cost one parse, not N. The JSON documents
    // are synthesized identically in both engines (ints + strings only —
    // no float formatting divergence); DuckDB mirrors with ->> JSONPath
    // extraction on the same strings. try_variant_get on an absent path
    // is the NULL-not-error contract (same as DuckDB's ->> miss).
    Q("fn_variant",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        concat(lit("{\"id\":"), col("o_orderkey"),
          lit(",\"status\":\""), col("o_orderstatus"),
          lit("\",\"tags\":[\""), col("o_orderpriority"),
          lit("\",\"p"), col("o_orderkey") % 7,
          lit("\"],\"nested\":{\"m\":"), col("o_orderkey") % 100,
          lit("}}")).as("jstr"))
        .select(col("o_orderkey"),
          expr("variant_get(parse_json(jstr), '$.id', 'bigint')").as("vid"),
          expr("variant_get(parse_json(jstr), '$.status', 'string')")
            .as("vstatus"),
          expr("variant_get(parse_json(jstr), '$.tags[1]', 'string')")
            .as("vtag"),
          expr("variant_get(parse_json(jstr), '$.nested.m', 'bigint')")
            .as("vm"),
          expr("try_variant_get(parse_json(jstr), '$.absent', 'bigint')")
            .as("vmissing"))
        .orderBy("o_orderkey"),
      """WITH j AS (
           SELECT o_orderkey,
                  '{"id":' || o_orderkey || ',"status":"' || o_orderstatus ||
                  '","tags":["' || o_orderpriority || '","p' ||
                  (o_orderkey % 7) || '"],"nested":{"m":' ||
                  (o_orderkey % 100) || '}}' AS jstr
           FROM orders)
         SELECT o_orderkey,
                CAST(jstr->>'$.id' AS BIGINT) AS vid,
                jstr->>'$.status' AS vstatus,
                jstr->>'$.tags[1]' AS vtag,
                CAST(jstr->>'$.nested.m' AS BIGINT) AS vm,
                CAST(jstr->>'$.absent' AS BIGINT) AS vmissing
         FROM j ORDER BY o_orderkey"""),

    // ARRAY SET ALGEBRA (union / intersect / except) — fn_array covers
    // indexing and folds; this covers the set verbs a tag-matching or
    // feature-overlap pipeline leans on. Results are SORTED then
    // serialized (raw list columns crash the comparator, and
    // DuckDB's list_distinct does not define an order — sorting
    // makes the declared value engine-neutral). Map-only.
    Q("fn_array_set_ops",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        expr("""concat_ws(',', sort_array(array_union(
                  array(o_orderkey % 5, o_orderkey % 7, o_orderkey % 11),
                  array(o_orderkey % 3, o_orderkey % 5))))""")
          .as("u"),
        expr("""concat_ws(',', sort_array(array_intersect(
                  array(o_orderkey % 5, o_orderkey % 7, o_orderkey % 11),
                  array(o_orderkey % 3, o_orderkey % 5))))""")
          .as("i"),
        expr("""concat_ws(',', sort_array(array_except(
                  array(o_orderkey % 5, o_orderkey % 7, o_orderkey % 11),
                  array(o_orderkey % 3, o_orderkey % 5))))""")
          .as("e"),
        expr("""array_contains(
                  array(o_orderkey % 5, o_orderkey % 7, o_orderkey % 11),
                  o_orderkey % 3)""").as("has"))
        .orderBy("o_orderkey"),
      """WITH t AS (
           SELECT o_orderkey,
                  [o_orderkey % 5, o_orderkey % 7, o_orderkey % 11] AS a,
                  [o_orderkey % 3, o_orderkey % 5] AS b
           FROM orders)
         SELECT o_orderkey,
                COALESCE(array_to_string(
                  list_sort(list_distinct(a || b)), ','), '') AS u,
                COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(a, x -> list_contains(b, x)))), ','), '')
                  AS i,
                COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(a, x -> NOT list_contains(b, x)))), ','),
                  '') AS e,
                list_contains(a, o_orderkey % 3) AS has
         FROM t ORDER BY o_orderkey"""),

    // AES ROUNDTRIP — column-level encryption for PII-bearing exports
    // (the mask-free alternative to fn_mask when the consumer must be
    // able to decrypt): aes_encrypt/aes_decrypt in ECB mode — GCM's
    // random IV would make every run's ciphertext different; ECB is
    // deterministic, which is exactly what a hash-checked relation
    // needs (and why real deployments pay GCM's nondeterminism — ECB
    // leaks equality, which the n_distinct_cipher column demonstrates:
    // it EQUALS the distinct plaintext count). The declared relation
    // is construction truth: every row roundtrips, ciphertext equality
    // mirrors plaintext equality.
    Q("fn_aes_roundtrip",
      (s, d) => {
        val key = "graft-0123456789"  // 16-byte AES-128 key
        customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"),
            expr(s"aes_encrypt(c_mktsegment, '$key', 'ECB')").as("ct"))
          .select(col("c_mktsegment"), col("ct"),
            expr(s"CAST(aes_decrypt(ct, '$key', 'ECB') AS STRING)")
              .as("rt"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("rt") === col("c_mktsegment"), 1L)
              .otherwise(0L)).as("n_roundtrip_ok"),
            countDistinct(col("ct")).as("n_distinct_cipher"),
            countDistinct(col("c_mktsegment")).as("n_distinct_plain"))
      },
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
                CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
                  AS n_distinct_cipher,
                CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
                  AS n_distinct_plain
         FROM customer"""),

    // Binary↔text codec roundtrips (base64 / hex) — the interchange
    // codecs every export/ingest boundary leans on. Both engines use
    // unchunked RFC-4648 base64 and uppercase hex, so the encoded
    // FORMS are compared directly, not just the roundtrip flags —
    // a one-char alphabet/padding drift fails the hash.
    Q("fn_encode_roundtrip",
      (s, d) => customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          base64(col("c_name").cast("binary")).as("b64"),
          hex(col("c_name")).as("hx"),
          unbase64(base64(col("c_name").cast("binary"))).cast("string")
            .as("b64_rt"),
          unhex(hex(col("c_name"))).cast("string").as("hex_rt"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name,
                base64(c_name::BLOB) AS b64,
                hex(c_name) AS hx,
                CAST(from_base64(base64(c_name::BLOB)) AS VARCHAR) AS b64_rt,
                CAST(unhex(hex(c_name)) AS VARCHAR) AS hex_rt
         FROM customer ORDER BY c_custkey"""),

    // XPATH extraction over per-row XML payloads — the legacy-feed
    // field-puller (SOAP bodies, RSS items, regulatory filings).
    // The XML is built row-side from typed columns, then xpath_string /
    // xpath() pull them back out; DuckDB has no XPath, so the oracle
    // replays the extraction as the identity on the source columns —
    // exactly what the xpath calls must reduce to. Money goes through
    // CAST(DECIMAL AS STRING) so the embedded text is canonical 2-dp.
    Q("fn_xpath",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          expr("""concat('<c><seg>', c_mktsegment, '</seg><bal>',
                    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING),
                    '</bal></c>')""").as("xml"))
        .select(col("c_custkey"),
          expr("xpath_string(xml, '/c/seg')").as("seg"),
          expr("CAST(xpath_string(xml, '/c/bal') AS DOUBLE)").as("bal"),
          expr("CAST(size(xpath(xml, '/c/*')) AS INT)").as("n_fields"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_mktsegment AS seg,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
                CAST(2 AS INT) AS n_fields
         FROM customer ORDER BY c_custkey"""),

    // CALENDAR INTERVAL ARITHMETIC + TIMEZONE CONVERSION — the
    // billing-cycle / fiscal-calendar surface: add_months (with the
    // end-of-month clamp both engines share: Jan 31 + 1mo = Feb 29),
    // last_day, ISO week start, quarter, and UTC→America/New_York
    // conversion whose offset is DATE-dependent (EST −5 / EDT −4
    // across the 1995–2001 range — a hardcoded offset fails the
    // hash). The oracle's tz form is the session-independent
    // timezone('NY', timezone('UTC', ts)) roundtrip.
    Q("fn_date_interval",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 1).as("next_bill"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        date_trunc("week", col("o_orderdate")).cast("date")
          .as("week_start"),
        quarter(col("o_orderdate")).as("qtr"),
        from_utc_timestamp(col("o_orderdate"), "America/New_York")
          .as("ny_ts"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
                  AS next_bill,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(date_trunc('week', o_orderdate) AS DATE)
                  AS week_start,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                timezone('America/New_York', timezone('UTC', o_orderdate))
                  AS ny_ts
         FROM orders ORDER BY o_orderkey"""),

    // BUSINESS-DAY ARITHMETIC — SLA clocks that skip weekends, via the
    // closed form wd(x) = 5·⌊dx/7⌋ + min(dx mod 7, 5) counting
    // weekdays since a MONDAY epoch (1994-12-26, before every date in
    // the data, so dx stays positive and div/mod agree across
    // engines). No calendar spine join, no UDF — pure integer
    // arithmetic on both sides. Declared over order→ship lag.
    Q("fn_business_days",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_orderkey"),
          col("l_linenumber"), col("l_shipdate"))
        val o = orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("""(5 * (datediff(CAST(l_shipdate AS DATE),
                          DATE '1994-12-26') div 7)
                     + least(datediff(CAST(l_shipdate AS DATE),
                          DATE '1994-12-26') % 7, 5))
                    - (5 * (datediff(CAST(o_orderdate AS DATE),
                          DATE '1994-12-26') div 7)
                     + least(datediff(CAST(o_orderdate AS DATE),
                          DATE '1994-12-26') % 7, 5))""").as("ship_bdays"),
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).as("ship_days"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber,
                (5 * (date_diff('day', DATE '1994-12-26',
                        CAST(l_shipdate AS DATE)) // 7)
                 + least(date_diff('day', DATE '1994-12-26',
                        CAST(l_shipdate AS DATE)) % 7, 5))
                - (5 * (date_diff('day', DATE '1994-12-26',
                        CAST(o_orderdate AS DATE)) // 7)
                 + least(date_diff('day', DATE '1994-12-26',
                        CAST(o_orderdate AS DATE)) % 7, 5)) AS ship_bdays,
                CAST(date_diff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS INT) AS ship_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber"""),

    // explode_outer — generator NULL-row retention: explode() DROPS a
    // parent row whose array is empty, explode_outer keeps it with a
    // NULL element (the left-join-lateral semantics every enrichment
    // pipeline wants). The array is arithmetic (k = 1..custkey%4, so
    // every custkey%4=0 row is the empty-array case); DuckDB UNNEST
    // drops empties, so the oracle replays the expansion with a range
    // join + an explicit NULL branch — exactly the semantics the
    // operator guarantees.
    Q("fn_explode_outer",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          expr("filter(array(1, 2, 3), x -> x <= c_custkey % 4)")
            .as("arr"))
        .select(col("c_custkey"), explode_outer(col("arr")).as("k"))
        .orderBy(col("c_custkey"), col("k").asc_nulls_first),
      """SELECT c_custkey, CAST(k AS INT) AS k
         FROM (
           SELECT c.c_custkey, r.range AS k
           FROM customer c JOIN range(1, 4) r
             ON r.range <= c.c_custkey % 4
           UNION ALL
           SELECT c_custkey, NULL AS k FROM customer
           WHERE c_custkey % 4 = 0)
         ORDER BY c_custkey, k NULLS FIRST"""),

    // DISPLAY FORMATTING PACK — format_number grouping separators,
    // C-style printf padding, chr/ascii, repeat/reverse: the
    // report-rendering surface. DuckDB's format() refuses thousand
    // separators on floats, so the oracle rebuilds Spark's
    // format_number from exact integer cents (sign split, grouped
    // int part, zero-padded fraction) — which also proves the
    // format is the canonical one, not locale-drifting. printf %.2f
    // of the identical double is identical in both engines; the
    // input is pre-cast to DECIMAL(18,2) so no rounding happens
    // inside the formatter at all.
    Q("fn_format_pack",
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        expr("format_number(CAST(c_acctbal AS DECIMAL(18,2)), 2)")
          .as("money"),
        expr("format_string('%07d', CAST(c_custkey AS INT))").as("padded"),
        expr("""format_string('%s|%05d', c_mktsegment,
                CAST(c_custkey % 1000 AS INT))""").as("tagline"),
        expr("chr(65 + CAST(c_custkey % 26 AS INT))").as("letter"),
        expr("ascii(chr(65 + CAST(c_custkey % 26 AS INT)))").as("code"),
        expr("repeat(substring(c_mktsegment, 1, 2), 3)").as("rpt"),
        reverse(col("c_mktsegment")).as("rev"))
        .orderBy("c_custkey"),
      """WITH c AS (SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents FROM customer)
         SELECT c_custkey,
                CASE WHEN cents < 0 THEN '-' ELSE '' END ||
                  format('{:,}', abs(cents) // 100) || '.' ||
                  lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0')
                  AS money,
                printf('%07d', c_custkey) AS padded,
                printf('%s|%05d', c_mktsegment, c_custkey % 1000)
                  AS tagline,
                chr(CAST(65 + c_custkey % 26 AS INT)) AS letter,
                CAST(ascii(chr(CAST(65 + c_custkey % 26 AS INT))) AS INT)
                  AS code,
                repeat(substring(c_mktsegment, 1, 2), 3) AS rpt,
                reverse(c_mktsegment) AS rev
         FROM c ORDER BY c_custkey"""),

    // DATE RENDERING — Spark's SimpleDateFormat-style patterns vs
    // DuckDB's strftime: the dialect mapping every report migration
    // hits (yyyy-MM-dd ↔ %Y-%m-%d, EEEE ↔ %A, MMM ↔ %b, DDD ↔ %j).
    // Weekday/month names compare under both engines' default English
    // locale; day-of-year uses the zero-padded forms on both sides.
    Q("fn_date_format",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        date_format(col("o_orderdate"), "MMM yyyy").as("mon_yr"),
        date_format(col("o_orderdate"), "DDD").as("doy"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS iso,
                strftime(o_orderdate, '%A') AS day_name,
                strftime(o_orderdate, '%b %Y') AS mon_yr,
                strftime(o_orderdate, '%j') AS doy
         FROM orders ORDER BY o_orderkey"""),

    // STRUCT→JSON→STRUCT ROUNDTRIP (to_json / from_json with an
    // explicit schema) — the message-bus serialization path: a typed
    // payload survives the wire format losslessly, including the
    // money field carried as canonical 2-dp decimal text. DuckDB
    // cannot replay Spark's from_json, so the oracle is the identity
    // on the source columns — exactly what a lossless roundtrip must
    // reduce to.
    Q("fn_json_roundtrip",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          expr("""from_json(
                    to_json(named_struct(
                      'seg', c_mktsegment,
                      'bal', CAST(c_acctbal AS DECIMAL(18,2)),
                      'nat', c_nationkey)),
                    'seg STRING, bal DECIMAL(18,2), nat INT')""")
            .as("rt"))
        .select(col("c_custkey"),
          col("rt.seg").as("seg"),
          expr("CAST(rt.bal AS DOUBLE)").as("bal"),
          col("rt.nat").as("nat"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_mktsegment AS seg,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
                CAST(c_nationkey AS INT) AS nat
         FROM customer ORDER BY c_custkey"""),

    // BIT-PACKED COMPOSITE KEYS — four small fields packed into one
    // BIGINT (20+20+16+8 bits) and unpacked losslessly: the
    // cache/join-key compression trick for high-cardinality
    // composites. Shift counts are constants < 64 so Spark's
    // mod-64 shiftleft wrap (the time_decay_sum ADVICE lesson) can't
    // fire; masks keep every lane nonnegative.
    // Field layout 19+20+16+8 = 63 bits: the top field must leave
    // the sign bit free — the original 20-bit top field summed to 64
    // bits, so a key with orderkey % 2^20 >= 2^19 overflowed signed
    // BIGINT (Spark shiftleft WRAPS silently, DuckDB errors — caught
    // by the r13 sf1 oracle run at orderkey 570008 << 44).
    Q("fn_bitpack_roundtrip",
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""(shiftleft(l_orderkey % 524288, 44)
                 + shiftleft(CAST(l_partkey % 1048576 AS BIGINT), 24)
                 + shiftleft(CAST(l_suppkey % 65536 AS BIGINT), 8)
                 + CAST(l_linenumber % 256 AS BIGINT))""").as("packed"))
        .select(col("l_orderkey"), col("l_linenumber"), col("packed"),
          expr("shiftright(packed, 44) & 524287").as("up_order"),
          expr("shiftright(packed, 24) & 1048575").as("up_part"),
          expr("shiftright(packed, 8) & 65535").as("up_supp"),
          expr("packed & 255").as("up_line"))
        .orderBy("l_orderkey", "l_linenumber"),
      """WITH p AS (SELECT l_orderkey, l_linenumber,
             ((l_orderkey % 524288) << 44)
             + (CAST(l_partkey % 1048576 AS BIGINT) << 24)
             + (CAST(l_suppkey % 65536 AS BIGINT) << 8)
             + CAST(l_linenumber % 256 AS BIGINT) AS packed
           FROM lineitem)
         SELECT l_orderkey, l_linenumber, packed,
                (packed >> 44) & 524287 AS up_order,
                (packed >> 24) & 1048575 AS up_part,
                (packed >> 8) & 65535 AS up_supp,
                packed & 255 AS up_line
         FROM p ORDER BY l_orderkey, l_linenumber"""),

    // IPv4 / CIDR ARITHMETIC — log-enrichment without an inet type:
    // dotted-quad → uint32 via split + shifts, CIDR membership via
    // the masked-prefix compare (ip >> (32−len) == net >> (32−len)).
    // IPs derive deterministically from user_id so the relation is
    // stable; membership classifies into RFC-1918 10/8, 172.16/12,
    // 192.168/16 or public.
    Q("fn_ip_cidr",
      (s, d) => events(s, d)
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          expr("""concat(CAST(pmod(user_id * 131, 224) + 1 AS STRING),
                  '.', CAST(pmod(user_id * 17, 256) AS STRING),
                  '.', CAST(pmod(user_id * 7, 256) AS STRING),
                  '.', CAST(pmod(user_id, 256) AS STRING))""").as("ip"))
        .select(col("user_id"), col("ip"),
          expr("""shiftleft(CAST(split(ip, '[.]')[0] AS BIGINT), 24)
                + shiftleft(CAST(split(ip, '[.]')[1] AS BIGINT), 16)
                + shiftleft(CAST(split(ip, '[.]')[2] AS BIGINT), 8)
                + CAST(split(ip, '[.]')[3] AS BIGINT)""").as("ip_num"))
        .select(col("user_id"), col("ip"), col("ip_num"),
          expr("""CASE
                    WHEN shiftright(ip_num, 24) = 10 THEN 'rfc1918_10'
                    WHEN shiftright(ip_num, 20) = 2753 THEN 'rfc1918_172'
                    WHEN shiftright(ip_num, 16) = 49320 THEN 'rfc1918_192'
                    ELSE 'public' END""").as("scope"))
        .orderBy("user_id"),
      """WITH ips AS (
           SELECT user_id,
                  CAST((user_id * 131) % 224 + 1 AS VARCHAR) || '.' ||
                  CAST((user_id * 17) % 256 AS VARCHAR) || '.' ||
                  CAST((user_id * 7) % 256 AS VARCHAR) || '.' ||
                  CAST(user_id % 256 AS VARCHAR) AS ip
           FROM (SELECT DISTINCT user_id FROM events)),
         nums AS (
           SELECT user_id, ip,
                  (CAST(string_split(ip, '.')[1] AS BIGINT) << 24)
                + (CAST(string_split(ip, '.')[2] AS BIGINT) << 16)
                + (CAST(string_split(ip, '.')[3] AS BIGINT) << 8)
                +  CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
           FROM ips)
         SELECT user_id, ip, ip_num,
                CASE
                  WHEN (ip_num >> 24) = 10 THEN 'rfc1918_10'
                  WHEN (ip_num >> 20) = 2753 THEN 'rfc1918_172'
                  WHEN (ip_num >> 16) = 49320 THEN 'rfc1918_192'
                  ELSE 'public' END AS scope
         FROM nums ORDER BY user_id"""),
  )
}
