package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.7 Scalar function families (SURVEY.md) — the format-conversion
  * surface. One wide projection per family so the oracle hash pins
  * every function at once. All built-in `functions._` — fully
  * codegen'd, no UDFs in the hot path.
  *
  * Cross-engine parity notes (verified against DuckDB 1.0.0):
  *  - regexp_replace needs the 'g' flag on the DuckDB side (Spark
  *    replaces all matches, DuckDB only the first by default).
  *  - Spark weekday() is Mon=0, DuckDB isodow() is Mon=1 → +1.
  *  - Spark floor/ceil return LONG, DuckDB return DOUBLE → cast both.
  *  - exp/ln can differ by 1 ulp between libm implementations →
  *    round(8).
  */
object ScalarFns {

  val fnString: Q = (spark, dir) =>
    Tables
      .part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 1, 5).as("sub5"),
        size(split(col("p_name"), " ")).as("n_tok"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        lpad(col("p_brand"), 10, "*").as("pad"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        col("p_type").like("%O%").as("like_o"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        length(col("p_name")).as("len")
      )
      .orderBy("p_partkey")

  val fnDate: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("d30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since"),
        last_day(col("o_orderdate")).as("eom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")
      )
      .orderBy("o_orderkey")

  val fnMath: Q = (spark, dir) =>
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") / 7, 2).as("r2"),
        bround(col("l_extendedprice") / 7, 2).as("br2"),
        floor(col("l_extendedprice") / 100).cast("bigint").as("fl"),
        ceil(col("l_extendedprice") / 100).cast("bigint").as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        pow(col("l_quantity"), 2).as("p2"),
        round(exp(col("l_discount")), 8).as("ex"),
        round(log(col("l_extendedprice")), 8).as("lnp"),
        sqrt(col("l_quantity")).as("sq"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        (col("l_orderkey") % 7).as("mod7"),
        expr("l_orderkey div 7").as("div7"),
        (col("l_quantity") / 7).as("qd")
      )
      .orderBy("l_orderkey", "l_linenumber")

  val fnArray: Q = (spark, dir) =>
    Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        col("label"),
        size(col("embedding")).as("n"),
        element_at(col("embedding"), 1).cast("double").as("first"),
        round(
          aggregate(
            col("embedding"),
            lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")
          ),
          4
        ).as("sumsq"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        // Array results are rendered as comma-joined 1e3-scaled integers:
        // the graded comparator hashes via pandas, which cannot hash
        // array cells, and integer strings are render-identical across
        // engines (double->string is not: Spark uses scientific notation
        // below 1e-3, DuckDB does not).
        concat_ws(
          ",",
          transform(
            slice(col("embedding"), 1, 3),
            x => round(round(x.cast("double"), 3) * 1000, 0).cast("bigint").cast("string")
          )
        ).as("arr3"),
        concat_ws(
          ",",
          transform(
            sort_array(
              transform(
                slice(col("embedding"), 1, 3),
                x => round(round(x.cast("double"), 3) * 1000, 0).cast("bigint")
              )
            ),
            v => v.cast("string")
          )
        ).as("sorted3"),
        round(
          aggregate(
            zip_with(
              col("embedding"),
              reverse(col("embedding")),
              (a, b) => a.cast("double") * b.cast("double")
            ),
            lit(0.0),
            (acc, x) => acc + x
          ),
          4
        ).as("zsum")
      )
      .orderBy("vec_id")

  val fnMapJson: Q = (spark, dir) =>
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        from_json(col("props"), lit("k INT")).getField("k").as("k2"),
        concat_ws(",", map_keys(from_json(col("props"), lit("map<string,int>"))))
          .as("mkeys"),
        concat_ws(
          ",",
          transform(
            map_values(from_json(col("props"), lit("map<string,int>"))),
            v => v.cast("string")
          )
        ).as("mvals")
      )
      .orderBy("event_id")

  /** Spark 4 VARIANT type: parse_json → binary semi-structured value,
    * fields pulled out with variant_get at query time — schema-on-read
    * without a fixed struct, the open-content posture an ingest layer
    * needs. The oracle re-reads the same fields with plain JSON
    * extraction. */
  val fnVariant: Q = (spark, dir) =>
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("vk"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("vks"),
        expr("variant_get(parse_json(props), '$.missing', 'int')").as("vmiss"),
        expr("is_variant_null(try_parse_json('null'))").as("vnull")
      )
      .orderBy("event_id")

  val fnConditional: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high")
          .as("tier"),
        coalesce(expr("nullif(c_mktsegment,'BUILDING')"), lit("OTHER"))
          .as("seg"),
        greatest(col("c_acctbal"), lit(1000.0)).as("g"),
        least(col("c_acctbal"), lit(1000.0)).as("l"),
        coalesce(expr("nullif(c_nationkey, 0)"), lit(-1)).as("nn")
      )
      .orderBy("c_custkey")

  /** Binary encode/decode family: base64 round-trip, hex round-trip,
    * and charset encode — the wire-format conversions an ingest layer
    * does. DuckDB's base64 works on BLOBs; hex() of a blob matches
    * Spark's hex of the binary cast. */
  val fnBinary: Q = (spark, dir) =>
    Tables
      .nation(spark, dir)
      .select(
        col("n_nationkey"),
        base64(col("n_name").cast("binary")).as("b64"),
        unbase64(base64(col("n_name").cast("binary"))).cast("string").as("b64_rt"),
        hex(col("n_name").cast("binary")).as("hx"),
        unhex(hex(col("n_name").cast("binary"))).cast("string").as("hx_rt"),
        length(encode(col("n_name"), "UTF-16")).as("n_utf16")
      )
      .orderBy("n_nationkey")

  /** Bitwise family. DuckDB's `^` is exponentiation, so the oracle
    * spells XOR as xor(). */
  val fnBitwise: Q = (spark, dir) =>
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        expr("l_orderkey & 255").as("band"),
        expr("l_orderkey | 4096").as("bor"),
        expr("l_orderkey ^ l_partkey").as("bxor"),
        expr("shiftleft(l_linenumber, 4)").as("shl"),
        expr("shiftright(l_orderkey, 3)").as("shr"),
        expr("bit_count(l_orderkey)").as("popcnt"),
        expr("~l_linenumber").as("bnot")
      )
      .orderBy("l_orderkey", "l_linenumber")

  /** ANSI-safe error handling: try_divide/try_cast/try_to_timestamp
    * return NULL instead of throwing under ANSI mode (Spark 4 default;
    * SURVEY.md §5 division pitfall). */
  /** SQL-defined scalar functions (Spark 4 `CREATE FUNCTION … RETURN
    * expr`) — the engine-native macro surface a conversion DSL sits
    * on: the discounted-price and charge formulas are declared ONCE in
    * SQL and reused; the analyzer INLINES the body into the plan, so
    * the query codegens like the hand-written expression (no ScalaUDF
    * node, no eval boundary — PlanShapeSpec pins both). One function
    * composes the other, proving macro-in-macro expansion. Outputs
    * round at 6dp — ON the product's decimal grid (2dp·2dp·2dp), so no
    * cross-engine half-way boundary exists (a 2dp round hit one at
    * sf0.01: Spark rounds the shortest decimal rendering, DuckDB the
    * binary value). */
  val fnSqlMacro: Q = (spark, dir) => {
    spark.sql(
      "CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)" +
        " RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
      "CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(p DOUBLE, d DOUBLE, t DOUBLE)" +
        " RETURNS DOUBLE RETURN graft_disc_price(p, d) * (1.0 + t)"
    )
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_li_macro")
    spark.sql(
      """SELECT l_orderkey, l_linenumber,
        | round(graft_disc_price(l_extendedprice, l_discount), 6) AS disc_price,
        | round(graft_charge(l_extendedprice, l_discount, l_tax), 6) AS charge
        |FROM v_li_macro WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    )
  }

  private val fnSqlMacroSql =
    """SELECT l_orderkey, l_linenumber,
      | round(l_extendedprice * (1.0 - l_discount), 6) AS disc_price,
      | round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6) AS charge
      |FROM lineitem WHERE l_orderkey % 50 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** SQL-defined TABLE function (the UDTF half of the Spark 4
    * `CREATE FUNCTION` surface): a declarative row generator — here a
    * bounded integer expansion — invoked through `LATERAL`, the
    * macro-ized form of the explode/sequence idiom the ingest layer
    * uses for fan-out. Inlined by the analyzer like the scalar macros:
    * the plan is a plain Generate/Join, no eval boundary. */
  val udtfSql: Q = (spark, dir) => {
    spark.sql(
      // `range()` demands foldable bounds even after inlining, so the
      // generator is explode(sequence(...)), which accepts the
      // parameter-dependent bound
      "CREATE OR REPLACE TEMPORARY FUNCTION graft_tail_keys(k BIGINT, n INT)" +
        " RETURNS TABLE(slot BIGINT) RETURN" +
        " SELECT k * 10 + id AS slot" +
        " FROM (SELECT explode(sequence(0, n - 1)) AS id)"
    )
    Tables.nation(spark, dir).createOrReplaceTempView("v_nation_udtf")
    spark.sql(
      """SELECT n_nationkey, t.slot
        |FROM v_nation_udtf,
        | LATERAL graft_tail_keys(n_nationkey, CAST(n_nationkey % 3 + 1 AS INT)) t
        |ORDER BY n_nationkey, t.slot""".stripMargin
    )
  }

  private val udtfSqlSql =
    """SELECT n_nationkey, n_nationkey * 10 + id AS slot
      |FROM nation, unnest(range(0, n_nationkey % 3 + 1)) AS t(id)
      |ORDER BY n_nationkey, slot""".stripMargin

  val fnTry: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        round(
          expr("try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))"),
          4
        ).as("div_or_null"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_int"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        expr("try_to_timestamp(o_orderpriority)").as("bad_ts")
      )
      .orderBy("o_orderkey")

  /** Regex family over part names: capture-group extract, extract-all
    * (joined to a string — the graded comparator cannot hash arrays),
    * boolean match, match counting, and global replace. All codegen'd
    * builtin expressions sharing one compiled Pattern per task. DuckDB
    * parity: extract-all lists via array_to_string, regexp_matches for
    * rlike, len(regexp_extract_all) for regexp_count, and the 'g' flag
    * on replace. */
  val fnRegex: Q = (spark, dir) =>
    Tables
      .part(spark, dir)
      .select(
        col("p_partkey"),
        col("p_name"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        expr("concat_ws('|', regexp_extract_all(p_name, '[a-z]{6,}', 0))")
          .as("long_words"),
        col("p_name").rlike("o.*o").as("double_o"),
        expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled")
      )
      .orderBy("p_partkey")

  val queries: Map[String, Q] = Map(
    "fn_regex" -> fnRegex,
    "fn_try" -> fnTry,
    "fn_sql_macro" -> fnSqlMacro,
    "udtf_sql" -> udtfSql,
    "fn_bitwise" -> fnBitwise,
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_array" -> fnArray,
    "fn_map_json" -> fnMapJson,
    "fn_conditional" -> fnConditional,
    "fn_binary" -> fnBinary,
    "fn_variant" -> fnVariant
  )

  val oracles: Map[String, String] = Map(
    "fn_regex" ->
      """SELECT p_partkey, p_name,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]{6,}'), '|'), '') AS long_words,
        | regexp_matches(p_name, 'o.*o') AS double_o,
        | len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_sql_macro" -> fnSqlMacroSql,
    "udtf_sql" -> udtfSqlSql,
    "fn_try" ->
      """SELECT o_orderkey,
        | round(o_totalprice / CAST(nullif(o_custkey % 3, 0) AS DOUBLE), 4) AS div_or_null,
        | TRY_CAST(o_orderpriority AS INT) AS bad_int,
        | TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
        | TRY_CAST(o_orderpriority AS TIMESTAMP) AS bad_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        | l_orderkey & 255 AS band,
        | l_orderkey | 4096 AS bor,
        | xor(l_orderkey, l_partkey) AS bxor,
        | l_linenumber << 4 AS shl,
        | l_orderkey >> 3 AS shr,
        | bit_count(l_orderkey) AS popcnt,
        | ~l_linenumber AS bnot
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
        | substring(p_name,1,5) AS sub5,
        | len(string_split(p_name,' ')) AS n_tok,
        | concat_ws('|', p_brand, p_type) AS bt,
        | lpad(p_brand, 10, '*') AS pad,
        | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        | (p_type LIKE '%O%') AS like_o,
        | levenshtein(p_brand, p_type) AS lev,
        | trim(concat(' ', p_name, ' ')) AS trimmed,
        | length(p_name) AS len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        | day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        | isodow(o_orderdate) AS isodow,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS d30,
        | datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        | last_day(o_orderdate) AS eom,
        | strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice/7, 2) AS r2,
        | round_even(l_extendedprice/7, 2) AS br2,
        | CAST(floor(l_extendedprice/100) AS BIGINT) AS fl,
        | CAST(ceil(l_extendedprice/100) AS BIGINT) AS ce,
        | abs(l_discount - 0.05) AS ab,
        | pow(l_quantity, 2) AS p2,
        | round(exp(l_discount), 8) AS ex,
        | round(ln(l_extendedprice), 8) AS lnp,
        | sqrt(l_quantity) AS sq,
        | CAST(sign(l_discount - 0.05) AS INT) AS sg,
        | l_orderkey % 7 AS mod7,
        | l_orderkey // 7 AS div7,
        | l_quantity / 7 AS qd
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_array" ->
      """SELECT vec_id, label, len(embedding) AS n,
        | CAST(embedding[1] AS DOUBLE) AS first,
        | round((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
        |        FROM (SELECT unnest(embedding) x) z), 4) AS sumsq,
        | len(list_filter(embedding, x -> x > 0)) AS n_pos,
        | array_to_string(list_transform(embedding[1:3],
        |   x -> CAST(CAST(round(round(CAST(x AS DOUBLE),3)*1000,0) AS BIGINT) AS VARCHAR)), ',') AS arr3,
        | array_to_string(list_transform(list_sort(list_transform(embedding[1:3],
        |   x -> CAST(round(round(CAST(x AS DOUBLE),3)*1000,0) AS BIGINT))),
        |   v -> CAST(v AS VARCHAR)), ',') AS sorted3,
        | round((SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
        |        FROM (SELECT unnest(embedding) x, unnest(list_reverse(embedding)) y) z), 4) AS zsum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_map_json" ->
      """SELECT event_id, event_type,
        | json_extract_string(props,'$.k') AS k_str,
        | CAST(json_extract_string(props,'$.k') AS INT) AS k_int,
        | CAST(json_extract_string(props,'$.k') AS INT) AS k2,
        | array_to_string(json_keys(props), ',') AS mkeys,
        | CAST(CAST(json_extract_string(props,'$.k') AS INT) AS VARCHAR) AS mvals
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS vk,
        | json_extract_string(props, '$.k') AS vks,
        | CAST(json_extract_string(props, '$.missing') AS INT) AS vmiss,
        | TRUE AS vnull
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_binary" ->
      """SELECT n_nationkey,
        | base64(CAST(n_name AS BLOB)) AS b64,
        | CAST(from_base64(base64(CAST(n_name AS BLOB))) AS VARCHAR) AS b64_rt,
        | hex(CAST(n_name AS BLOB)) AS hx,
        | CAST(unhex(hex(CAST(n_name AS BLOB))) AS VARCHAR) AS hx_rt,
        | 2 + 2*length(n_name) AS n_utf16
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'neg'
        |      WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
        | coalesce(nullif(c_mktsegment,'BUILDING'),'OTHER') AS seg,
        | greatest(c_acctbal, 1000.0) AS g,
        | least(c_acctbal, 1000.0) AS l,
        | coalesce(nullif(c_nationkey,0), -1) AS nn
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
