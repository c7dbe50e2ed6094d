"""Registered queries — each SURVEY.md §2 operator surfaced as a named
(spark_fn, oracle_sql) pair over the driver testdata.

Role mapping (FIXTURES.md §A): `events` plays `messages` (event_id = natural
key, ts = event time, user_id = sender/room analog, props = JSONB content);
customer/supplier/nation/region play the dimension tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.functions import scalar as fx
from beeper_matric_etl_tool_spark.operators import integrity, stats
from beeper_matric_etl_tool_spark.operators.merge import merge_upsert
from beeper_matric_etl_tool_spark.operators.nesting import nest_children
from beeper_matric_etl_tool_spark.operators.pagination import keyset_page
from beeper_matric_etl_tool_spark.plans.registry import register
from beeper_matric_etl_tool_spark.sources.tables import table

# --------------------------------------------------------------------------
# Phase 0 flagship — keyset-paginated message page (P3+P4+O2/O3)
# routes.ts:132-143: WHERE room_id=$1 AND timestamp<$3 ORDER BY ts DESC LIMIT $2
# --------------------------------------------------------------------------

PAGE_CURSOR = "2024-06-01 00:00:00"


@register(
    "messages_topk_page",
    headline=True,
    tags=("P3", "P4", "O2", "O3"),
    oracle=f"""
        WITH top AS (
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            WHERE user_id = 12 AND ts < TIMESTAMP '{PAGE_CURSOR}'
            ORDER BY ts DESC, event_id DESC
            LIMIT 100
        )
        SELECT CAST((row_number() OVER (ORDER BY ts DESC, event_id DESC) - 1) // 50 + 1
                    AS INT) AS page_no,
               event_id, ts, user_id, event_type, value, props
        FROM top
    """,
)
def messages_topk_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/O2/O3 — both keyset pages from ONE top-k pass: a single
    TakeOrderedAndProject(limit = 2 pages × 50) under the pinned total
    order (ts desc, event_id desc), then page numbers derived by ranking
    the 100-row result. Equivalent to issuing the pages one at a time with
    a tuple-keyset cursor — and strictly safer under ts ties, since the
    cursor is effectively (ts, event_id), not ts alone. routes.ts:132-143:
    WHERE room_id=$1 AND timestamp<$3 ORDER BY ts DESC LIMIT $2.

    Scale shape: the top-k is per-partition-pruned (each task returns ≤100
    rows, k-row driver merge — no global sort of the base data); the only
    Sort in the plan is the page-numbering window over the ≤100 surviving
    rows."""
    events = table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    top = keyset_page(
        events.select(*cols),
        order_col="ts",
        tie_col="event_id",
        limit=100,
        before=F.lit(PAGE_CURSOR).cast("timestamp"),
        predicate=F.col("user_id") == F.lit(12),
    )
    w = Window.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    page_no = ((F.row_number().over(w) - F.lit(1)) / F.lit(50)).cast("int") + F.lit(1)
    return top.select(page_no.alias("page_no"), *cols)


# --------------------------------------------------------------------------
# Phase 1 — relational read surface (SURVEY §2.1, §2.3, §2.5, §2.6)
# --------------------------------------------------------------------------


@register(
    "small_reads_suite",
    tags=("S7", "S9", "O4", "P1", "P3"),
    oracle="""
        SELECT 'point_lookup' AS surface, CAST(c_custkey AS BIGINT) AS key,
               c_name AS name, c_acctbal AS acctbal
        FROM customer WHERE c_custkey = 42
        UNION ALL
        SELECT 'credentials' AS surface, CAST(s_suppkey AS BIGINT) AS key,
               s_name AS name, s_acctbal AS acctbal
        FROM supplier WHERE s_suppkey <= 5
        UNION ALL
        SELECT 'config_head' AS surface, CAST(r_regionkey AS BIGINT) AS key,
               r_name AS name, CAST(NULL AS DOUBLE) AS acctbal
        FROM (SELECT * FROM region ORDER BY r_regionkey LIMIT 1)
    """,
)
def small_reads_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three point-read surfaces in one harmonized relation (each leg
    keeps its own pushed-down plan — the union is presentation):

    surface='point_lookup' — S7 PK lookup (routes.ts:106-112); the equality
    predicate reaches the parquet scan, so min/max row-group stats touch a
    single row group at any scale.
    surface='credentials' — S9/P1 projection + filter (db.utils.ts:13-28
    `SELECT device_id, access_token … WHERE user_id = $1`); ReadSchema
    prunes the supplier scan to 3 columns.
    surface='config_head' — O4 LIMIT 1 read (routes.ts:251); the
    reference's bare LIMIT 1 is row-order nondeterministic, we pin a total
    order — determinism is part of the engine contract."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            F.lit("point_lookup").alias("surface"),
            F.col("c_custkey").cast("long").alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    creds = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 5)
        .select(
            F.lit("credentials").alias("surface"),
            F.col("s_suppkey").cast("long").alias("key"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    head = (
        table(spark, sf_dir, "region")
        .orderBy("r_regionkey")
        .limit(1)
        .select(
            F.lit("config_head").alias("surface"),
            F.col("r_regionkey").cast("long").alias("key"),
            F.col("r_name").alias("name"),
            F.lit(None).cast("double").alias("acctbal"),
        )
    )
    return cust.unionByName(creds).unionByName(head)


@register(
    "checkpoint_latest",
    tags=("S8", "A3"),
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def checkpoint_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — latest checkpoint token (db.utils.ts:271-280 `ORDER BY created_at
    DESC LIMIT 1`). TakeOrderedAndProject with k=1 — a distributed argmax."""
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
    )


@register(
    "logs_tail",
    headline=True,
    tags=("O2",),
    oracle="""
        SELECT event_id, ts, event_type FROM events
        ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def logs_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — top-k tail of the log (routes.ts:238-241, LIMIT 100)."""
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
    )


# --------------------------------------------------------------------------
# Joins & nesting (SURVEY §2.4 J1/J2/J3, §2.5 A2)
# --------------------------------------------------------------------------


@register(
    "rooms_with_participants",
    headline=True,
    tags=("J1", "J2", "A2"),
    oracle="""
        SELECT 'nation_members' AS rel, n_nationkey AS parent_key, n_name AS parent_name,
               coalesce(to_json(list_sort(list(c_name) FILTER (c_name IS NOT NULL))), '[]')
                 AS children_json,
               count(c_name) AS n_children
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name
        UNION ALL
        SELECT 'region_nations' AS rel, r_regionkey AS parent_key, r_name AS parent_name,
               to_json(list_sort(list(n_name))) AS children_json,
               count(n_name) AS n_children
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_regionkey, r_name
        UNION ALL
        SELECT 'nation_rooms' AS rel, n_nationkey AS parent_key, n_name AS parent_name,
               CAST(n_regionkey AS VARCHAR) AS children_json,
               CAST(n_regionkey AS BIGINT) AS n_children
        FROM nation
    """,
)
def rooms_with_participants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2/A2 — both nesting directions in one harmonized relation:
    room→participants (routes.ts:107-110 correlated `json_agg`, left-join
    variant with empty-array default) and user→rooms (routes.ts:169-174,
    inner-join variant). Decorrelated to aggregate-then-broadcast-join;
    nation plays rooms, customer plays participants (FIXTURES.md role map).

    The rel='nation_rooms' slice is the S6/O1/P2 full listing scan
    (routes.ts:92 `SELECT * FROM rooms ORDER BY …`): every nation row with
    all three columns surfaced. Ordering is presentation-only (recency per
    intent, SURVEY §8 B3) — the driver compares order-insensitively."""
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    members = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"), "c_name"
    )
    nested1 = nest_children(
        nation, members, on="n_nationkey", child_col=F.col("c_name"),
        nested_name="member_names", count_name="n_children",
    ).select(
        F.lit("nation_members").alias("rel"),
        F.col("n_nationkey").alias("parent_key"),
        F.col("n_name").alias("parent_name"),
        F.to_json(F.col("member_names")).alias("children_json"),
        F.col("n_children").cast("long").alias("n_children"),
    )
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nations = table(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("r_regionkey"), "n_name"
    )
    nested2 = nest_children(
        region, nations, on="r_regionkey", child_col=F.col("n_name"),
        nested_name="nation_names", count_name="n_children", how="inner",
    ).select(
        F.lit("region_nations").alias("rel"),
        F.col("r_regionkey").alias("parent_key"),
        F.col("r_name").alias("parent_name"),
        F.to_json(F.col("nation_names")).alias("children_json"),
        F.col("n_children").cast("long").alias("n_children"),
    )
    nations_all = table(spark, sf_dir, "nation").select(
        F.lit("nation_rooms").alias("rel"),
        F.col("n_nationkey").alias("parent_key"),
        F.col("n_name").alias("parent_name"),
        F.col("n_regionkey").cast("string").alias("children_json"),
        F.col("n_regionkey").cast("long").alias("n_children"),
    )
    return nested1.unionByName(nested2).unionByName(nations_all)


@register(
    "fk_audit",
    tags=("J3",),
    oracle="""
        SELECT 'orphan' AS fk_status, c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'enforced' AS fk_status, c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — both halves of the integrity audit in one relation: the
    anti-join finds dimension rows with no facts ('orphan'); the semi-join
    applies the constraint ('enforced' = cascade-delete survivors). Both
    run the same single shuffle shape on the key column."""
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = table(spark, sf_dir, "orders")
    orphans = integrity.orphans(customer, orders, ["c_custkey"], ["o_custkey"]).select(
        F.lit("orphan").alias("fk_status"), "c_custkey", "c_name"
    )
    enforced = integrity.enforce_fk(customer, orders, ["c_custkey"], ["o_custkey"]).select(
        F.lit("enforced").alias("fk_status"), "c_custkey", "c_name"
    )
    return orphans.unionByName(enforced)


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 A1/A3/A4) + load kernels (§2.2 K1–K3)
# --------------------------------------------------------------------------


@register(
    "stats_summary",
    headline=True,
    tags=("A1", "A4", "A-ext"),
    oracle="""
        SELECT (SELECT count(*) FROM events) AS total_events,
               (SELECT count(DISTINCT user_id) FROM events) AS total_users,
               (SELECT count(*) FROM events WHERE event_type = 'purchase') AS purchase_events,
               (SELECT epoch_ms(max(ts)) FROM events) AS last_sync_ms,
               (SELECT count(*) FROM customer) AS total_customers,
               (SELECT quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.25)
                FROM events) AS q25_value_cents,
               (SELECT quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.50)
                FROM events) AS q50_value_cents,
               (SELECT quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.75)
                FROM events) AS q75_value_cents
    """,
)
def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4 — the /api/stats summary row (routes.ts:216-224) + dashboard
    conditional counters (dashboard.tsx:8-14) + exact value quartiles
    (linear interpolation over integer cents — bit-identical across
    engines, see the approx_sketches twin).

    Scale shape: the exact distinct-user count rides Catalyst's
    single-distinct rewrite — for ONE distinct column the planner groups
    partials by (user_id) map-side and folds through a single exchange, the
    two-level shape with no Expand (Expand only appears with several
    distinct columns) and nothing hand-rolled. The other counters share
    that same partial-aggregated scan. Quartiles are exact but
    HISTOGRAM-BASED: cents values are grouped to (value, freq) first —
    map-side combine collapses the stream to the distinct-cents domain
    (bounded by the price domain, not |events|) — then one weighted
    ``percentile(v, p, freq)`` folds the tiny histogram. A raw-column
    percentile would buffer every row's value in the single final task:
    the one serial O(|events|) step in an otherwise partial-aggregated
    plan, and the first thing to fall over at 100 TB."""
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    ev = events.agg(
        F.count(F.lit(1)).cast("long").alias("total_events"),
        F.countDistinct("user_id").alias("total_users"),
        stats.conditional_count(F.col("event_type") == "purchase", "purchase_events"),
        F.unix_millis(F.max("ts")).alias("last_sync_ms"),
    )
    cents = fx.cents(F.col("value"))
    hist = (
        events.select(cents.alias("__cents"))
        .groupBy("__cents")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    pct = hist.agg(
        F.expr("percentile(__cents, 0.25D, __freq)").alias("q25_value_cents"),
        F.expr("percentile(__cents, 0.50D, __freq)").alias("q50_value_cents"),
        F.expr("percentile(__cents, 0.75D, __freq)").alias("q75_value_cents"),
    )
    cu = customer.agg(F.count(F.lit(1)).alias("total_customers"))
    return stats.scalar_summary(events=ev, customers=cu, percentiles=pct)


@register(
    "latest_event_per_user",
    headline=True,
    tags=("K1", "A3", "F4", "F14"),
    oracle="""
        WITH latest AS (
            SELECT user_id, event_id AS last_event_id, ts AS last_ts,
                   event_type AS last_type
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        ),
        first_signup AS (
            -- (ts, event_id) tuple-min; DuckDB's min_by can't take a struct
            -- ordering key, so the tie-broken first row comes from a window
            SELECT user_id, props FROM events WHERE event_type = 'signup'
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) = 1
        ),
        state AS (
            SELECT user_id,
                   (count(*) FILTER (WHERE event_type = 'error') > 0) AS has_errors
            FROM events GROUP BY user_id
        )
        SELECT l.user_id, last_event_id, last_ts, last_type,
               coalesce(f.props, '') AS first_signup_props, has_errors
        FROM latest l JOIN state USING (user_id)
        LEFT JOIN first_signup f USING (user_id)
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/A3 — the last-write-wins upsert kernel (db.utils.ts:35-47 `ON
    CONFLICT DO UPDATE`): one row per key, latest under a total order —
    PLUS the F4 state-extraction columns (db.utils.ts:107-116: payload of
    the earliest 'signup' event with `?? ''` default, existence-test error
    flag). All aggregates max_by/min_by/count_if in ONE groupBy: partial-
    combined map-side, the shuffle carries one candidate per (partition,
    key), and the state columns ride the same single shuffle for free."""
    events = table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.expr("max_by(event_id, struct(ts, event_id))").alias("last_event_id"),
        F.max("ts").alias("last_ts"),
        F.expr("max_by(event_type, struct(ts, event_id))").alias("last_type"),
        # tie-break on (ts, event_id) like the max_by twins above — a bare
        # min_by(props, ts) picks an arbitrary winner when two signups
        # share a timestamp (scan-order dependent on BOTH engines)
        F.coalesce(
            F.expr(
                "min_by(props, struct(ts, event_id)) FILTER (WHERE event_type = 'signup')"
            ),
            F.lit(""),
        ).alias("first_signup_props"),
        (F.count_if(F.col("event_type") == "error") > 0).alias("has_errors"),
    )


@register(
    "merge_changed_dim",
    headline=True,
    tags=("K2", "K3", "P8"),
    oracle="""
        WITH incoming AS (
            SELECT c_custkey, c_name, c_nationkey,
                   c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END
                     AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 7 = 0
        ),
        flagged AS (
            SELECT coalesce(e.c_custkey, i.c_custkey) AS c_custkey,
                   e.c_name AS e_name, e.c_nationkey AS e_nationkey,
                   e.c_acctbal AS e_acctbal, e.c_mktsegment AS e_mktsegment,
                   i.c_name AS i_name, i.c_nationkey AS i_nationkey,
                   i.c_acctbal AS i_acctbal, i.c_mktsegment AS i_mktsegment,
                   (e.c_custkey IS NULL) AS is_insert,
                   (e.c_custkey IS NOT NULL AND i.c_custkey IS NOT NULL AND (
                        e.c_name       IS DISTINCT FROM i.c_name OR
                        e.c_nationkey  IS DISTINCT FROM i.c_nationkey OR
                        e.c_acctbal    IS DISTINCT FROM i.c_acctbal OR
                        e.c_mktsegment IS DISTINCT FROM i.c_mktsegment)) AS is_update
            FROM customer e FULL OUTER JOIN incoming i ON e.c_custkey = i.c_custkey
        )
        SELECT c_custkey,
               CASE WHEN is_insert OR is_update THEN i_name       ELSE e_name       END AS c_name,
               CASE WHEN is_insert OR is_update THEN i_nationkey  ELSE e_nationkey  END AS c_nationkey,
               CASE WHEN is_insert OR is_update THEN i_acctbal    ELSE e_acctbal    END AS c_acctbal,
               CASE WHEN is_insert OR is_update THEN i_mktsegment ELSE e_mktsegment END AS c_mktsegment,
               CASE WHEN is_insert THEN 'insert' WHEN is_update THEN 'update'
                    ELSE 'keep' END AS action
        FROM flagged
    """,
)
def merge_changed_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K3 — change-detecting upsert merge (db.utils.ts:68-152). The
    incoming batch is derived deterministically from customer: even keys
    redelivered (every 5th with a changed balance → 'update', rest →
    'keep' = dead write skipped), every-7th key shifted +1e6 → 'insert'."""
    customer = table(spark, sf_dir, "customer")
    redelivered = customer.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal",
        F.col("c_acctbal")
        + F.when(F.col("c_custkey") % 5 == 0, F.lit(100.0)).otherwise(F.lit(0.0)),
    )
    inserts = customer.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    )
    incoming = redelivered.unionByName(inserts)
    return merge_upsert(customer, incoming, keys=["c_custkey"])


# --------------------------------------------------------------------------
# Scalar-function surface (SURVEY §2.8)
# --------------------------------------------------------------------------


@register(
    "events_scalar_battery",
    tags=(
        "F1", "F2", "F3", "F5", "F6", "F9", "F10", "F11", "F12", "F14",
        "F-crypto", "P8", "map",
    ),
    oracle=r"""
        SELECT event_id,
               concat('@user', CAST(user_id AS VARCHAR), ':matrix.example.org') AS sender,
               concat('!', event_type) AS room_id,
               props AS content,
               epoch_ms(ts) AS ts_millis,
               (event_type = 'error') AS is_error,
               strftime(ts, '%Y-%m-%d %H:%M') AS ts_rendered,
               to_json(struct_pack(event_type := event_type, event_id := event_id))
                 AS event_json,
               props AS decrypted,
               sender_norm,
               str_split(sender_norm, ':')[2] AS domain,
               concat(upper(substr(event_type, 1, 1)), substr(event_type, 2)) AS event_type_cap,
               k_str, CAST(k_str AS BIGINT) AS k_num,
               coalesce(value, 0.0) AS value_filled,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               nullif(event_type, 'error') AS type_or_null,
               coalesce(nullif(event_type, 'error'), 'quarantined') AS type_defaulted,
               (value IS NOT DISTINCT FROM NULL) AS value_is_null_safe
        FROM (
            SELECT *,
                   regexp_replace(
                       concat('@user', CAST(user_id AS VARCHAR), ':https://matrix.example.org'),
                       '^(.+?):https://matrix\.(.+)$', '\1:\2') AS sender_norm,
                   json_extract_string(props, '$.k') AS k_str
            FROM events
        )
    """,
)
def events_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole per-event scalar plane over ONE events scan (the three
    former single-scan batteries merged — every tag and column kept):

    - F3/F9 — event→row extraction of persistMessage (db.utils.ts:49-59);
      F1 — row→JSON serialization (`JSON.stringify`, db.utils.ts:53) via
      to_json(struct); F10 — timestamp presentation (`toLocaleString`,
      dashboard.tsx:110) via date_format; and the crypto plane — E2E
      capability mapped to column-level aes_encrypt/aes_decrypt (ECB for
      determinism here; GCM in production where the random IV is a
      feature). The oracle checks the roundtrip law decrypt(encrypt(x))=x.
    - F2/F5/F6/F11/F12/F14 — homeserver normalization regex
      (client.ts:151), mxid domain split (db.utils.ts:233), first-char
      capitalize (sync-status.tsx:121), JSON field extraction + int parse
      (routes.ts:227-228), null-coalescing defaults, plus the structural
      JSON plane: the payload parsed into a MapType and its key set
      extracted (schema-on-read; get_json_object is the point-access
      half).
    - P8/F14 depth — the null algebra the upsert kernels rely on: nullif
      quarantining, coalesce defaults, null-safe comparison (IS NOT
      DISTINCT FROM ≙ eqNullSafe)."""
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    enc = F.aes_encrypt(F.col("props"), key, F.lit("ECB"))
    dec = F.aes_decrypt(F.unbase64(F.base64(enc)), key, F.lit("ECB"))
    sender = F.concat(
        F.lit("@user"), F.col("user_id").cast("string"), F.lit(":https://matrix.example.org")
    )
    sender_norm = fx.normalize_matrix_user(sender)
    k_str = fx.json_field("props", "k")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("@user"), F.col("user_id").cast("string"), F.lit(":matrix.example.org")
        ).alias("sender"),
        F.concat(F.lit("!"), F.col("event_type")).alias("room_id"),
        F.col("props").alias("content"),
        fx.ts_to_millis("ts").alias("ts_millis"),
        (F.col("event_type") == "error").alias("is_error"),
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm").alias("ts_rendered"),
        F.to_json(F.struct(F.col("event_type"), F.col("event_id"))).alias("event_json"),
        dec.cast("string").alias("decrypted"),
        sender_norm.alias("sender_norm"),
        fx.mxid_domain(sender_norm).alias("domain"),
        fx.capitalize("event_type").alias("event_type_cap"),
        k_str.alias("k_str"),
        k_str.cast("long").alias("k_num"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.concat_ws(
            ",", F.sort_array(F.map_keys(F.from_json(F.col("props"), "map<string,string>")))
        ).alias("keys_csv"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("quarantined")).alias(
            "type_defaulted"
        ),
        F.col("value").eqNullSafe(F.lit(None).cast("double")).alias("value_is_null_safe"),
    )


# --------------------------------------------------------------------------
# Analytics at fact-table scale — bench workhorses. These are the queries
# whose plans must survive 100 TB: single-shuffle partial aggs, broadcast
# dimension joins, rollup grouping sets.
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    headline=True,
    tags=("A-scale",),
    oracle="""
        -- every sum() is CAST back to BIGINT: DuckDB promotes integer sum()
        -- to HUGEINT (int128), which pandas-converts to float64 and breaks
        -- the driver's type-sensitive value hash even when values are equal
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_base_price_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                 AS sum_disc_price_c4,
               CAST((1000000 * sum(CAST(l_quantity AS BIGINT))) // count(*) AS BIGINT)
                 AS avg_qty_ppm,
               CAST((10000 * sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) // count(*)
                    AS BIGINT) AS avg_disc_ppm,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary over the full fact table: predicate
    pushed to the scan, all aggregates partial-combined map-side, one
    shuffle of (flag,status) partials — the canonical scan-heavy plan.

    Money/ratio outputs are exact integers (cents, 10⁻⁴-dollar units, ppm):
    the source columns are exact 2-dp decimals stored as doubles, so integer
    fixed-point makes every aggregate bit-reproducible across engines AND
    across partition orders — float sums commute only approximately.
    """
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    price_cents = fx.cents(F.col("l_extendedprice"))
    disc_cents = fx.cents(F.col("l_discount"))
    agged = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_cents).alias("sum_base_price_cents"),
            F.sum(price_cents * (F.lit(100) - disc_cents)).alias("sum_disc_price_c4"),
            F.sum(disc_cents).alias("__sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # averages as DECIMAL integer division, not double floor: the oracle
    # divides exact HUGEINTs, and floor(double) only agrees while
    # 1e6·sum(qty) < 2^53 — true at bench SFs but NOT at SF ≳ 60, where
    # the long→double rounding could flip the floor by 1. `a div b` over
    # decimal(38,0) is exact at any scale this engine will meet.
    return agged.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_cents",
        "sum_disc_price_c4",
        F.expr(
            "CAST((1000000 * CAST(sum_qty AS DECIMAL(38,0))) DIV count_order AS BIGINT)"
        ).alias("avg_qty_ppm"),
        F.expr(
            "CAST((10000 * CAST(__sum_disc AS DECIMAL(38,0))) DIV count_order AS BIGINT)"
        ).alias("avg_disc_ppm"),
        "count_order",
    )


@register(
    "top_revenue_customers",
    headline=True,
    tags=("A-scale", "J-scale"),
    oracle="""
        SELECT c_custkey, c_name,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                 AS revenue_c4,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue_c4 DESC, c_custkey
        LIMIT 10
    """,
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join + top-k. Plan shape chosen for scale: lineitem first
    partial-aggregates to one row per order key (map-side combine shrinks
    the shuffle to |orders| rows), that pre-agg co-shuffles with orders on
    the same key, and the per-customer rollup then needs count(*) instead
    of an expensive count(DISTINCT) expansion. The (small) customer dim
    joins broadcast; ranking is rounded-revenue with key tie-break so
    top-10 selection is engine-independent.

    The pre-agg⋈orders join is hinted SHUFFLE_HASH (build = the 2-column
    pre-agg): orders is NOT broadcastable at 100 TB, but static stats rank
    it under the threshold at bench scale and broadcast it — the hint keeps
    the scale-correct co-shuffle on the order key, sort-free, and measures
    ~20% faster here too."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    price_cents = fx.cents(F.col("l_extendedprice"))
    disc_cents = fx.cents(F.col("l_discount"))
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(price_cents * (F.lit(100) - disc_cents)).alias("__order_rev_c4")
    ).hint("SHUFFLE_HASH")
    revenue = (
        per_order.join(o, per_order["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum("__order_rev_c4").alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return (
        revenue.join(F.broadcast(c), revenue["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "c_name", "revenue_c4", "n_orders")
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "orders_grouping_sets",
    tags=("A-ext",),
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_total_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS is_total_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_price_cents
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets machinery in one query: the full CUBE (all 2^k sets —
    a strict superset of the status→priority ROLLUP's sets) with GROUPING()
    markers distinguishing 'subtotal row' NULLs from genuinely-NULL group
    values. Catalyst expands the grouping sets before the single
    partial-agg shuffle, so cost grows with sets, not with extra scans."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("is_total_status"),
            F.grouping("o_orderpriority").cast("long").alias("is_total_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(fx.cents(F.col("o_totalprice"))).alias("total_price_cents"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "is_total_status",
            "is_total_priority", "n_orders", "total_price_cents",
        )
    )


@register(
    "events_enriched",
    headline=True,
    tags=("J4",),
    oracle="""
        SELECT e.event_id, e.ts, e.event_type, e.value,
               c.c_name AS user_name, c.c_mktsegment AS user_segment
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — stream-to-state correlation as a batch twin: fact stream ×
    broadcast user dimension (the enrichment join every micro-batch runs;
    identical plan under readStream)."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return e.join(F.broadcast(c), e["user_id"] == c["c_custkey"]).select(
        "event_id", "ts", "event_type", "value",
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("user_segment"),
    )


@register(
    "set_ops_suite",
    tags=("U1",),
    oracle="""
        SELECT 'union' AS op, * FROM (
            SELECT event_type AS val FROM events
            UNION
            SELECT o_orderstatus AS val FROM orders
        )
        UNION ALL
        SELECT 'intersect' AS op, * FROM (
            SELECT substr(event_type, 1, 1) AS val FROM events
            INTERSECT
            SELECT substr(o_orderpriority, 3, 1) AS val FROM orders
        )
        UNION ALL
        SELECT 'except' AS op, * FROM (
            SELECT event_type AS val FROM events
            EXCEPT
            SELECT o_orderstatus AS val FROM orders
        )
    """,
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — the full set-semantics surface in one relation: UNION
    (distinct; the new-batch ∪ existing shape the upsert family reduces
    to), INTERSECT (distinct), and EXCEPT (distinct difference, via
    DataFrame.subtract — NOT exceptAll().distinct(), which diverges from
    SQL EXCEPT whenever a value occurs on both sides with a higher left
    count: the survivors-by-multiplicity then pass .distinct())."""
    events = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    e_kind = events.select(F.col("event_type").alias("val"))
    o_kind = orders.select(F.col("o_orderstatus").alias("val"))
    union = e_kind.unionByName(o_kind).distinct()
    intersect = events.select(
        F.substring(F.col("event_type"), 1, 1).alias("val")
    ).intersect(orders.select(F.substring(F.col("o_orderpriority"), 3, 1).alias("val")))
    except_ = e_kind.subtract(o_kind)
    return (
        union.select(F.lit("union").alias("op"), "val")
        .unionByName(intersect.select(F.lit("intersect").alias("op"), "val"))
        .unionByName(except_.select(F.lit("except").alias("op"), "val"))
    )


# (the AES roundtrip column rides `events_scalar_battery` — same events scan)


# (F4 first-state extraction is folded into `latest_event_per_user` —
# the same per-user shuffle carries both the argmax and the state columns)


@register(
    "auth_derivations",
    tags=("F7", "F13"),
    oracle="""
        SELECT user_id,
               upper(substr(translate(md5(CAST(user_id AS VARCHAR)),
                                      '0123456789abcdef', 'ABCDEFGHIJKLMNOP'), 1, 10))
                 AS device_id,
               regexp_matches(domain,
                 '^[a-z0-9]([a-z0-9-]*[a-z0-9])?(\\.[a-z0-9]([a-z0-9-]*[a-z0-9])?)+$')
                 AS domain_ok
        FROM (
            SELECT DISTINCT user_id,
                   CASE WHEN user_id % 3 = 0 THEN 'matrix.example.org'
                        WHEN user_id % 3 = 1 THEN 'bad..domain'
                        ELSE 'sub.domain-x.io' END AS domain
            FROM events
        )
    """,
)
def auth_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F13 — the auth plane's derivations: deterministic device-id (the
    engine's replay-safe substitute for the reference's Math.random draw,
    client.ts:316-321) and domain validity gating."""
    users = table(spark, sf_dir, "events").select("user_id").distinct()
    domain = (
        F.when(F.col("user_id") % 3 == 0, "matrix.example.org")
        .when(F.col("user_id") % 3 == 1, "bad..domain")
        .otherwise("sub.domain-x.io")
    )
    return users.select(
        "user_id",
        fx.device_id("user_id").alias("device_id"),
        fx.is_valid_domain(domain).alias("domain_ok"),
    )


@register(
    "events_asof_state",
    tags=("J4", "asof"),
    oracle="""
        SELECT e.user_id, e.event_id, e.ts, e.value, s.signup_value
        FROM (SELECT user_id, event_id, ts, value FROM events
              WHERE event_type = 'purchase') e
        ASOF LEFT JOIN (SELECT user_id, ts AS sts, value AS signup_value
                        FROM events WHERE event_type = 'signup'
                        QUALIFY row_number() OVER (
                            PARTITION BY user_id, ts
                            ORDER BY event_id DESC) = 1) s
          ON e.user_id = s.user_id AND e.ts >= s.sts
    """,
)
def events_asof_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of temporal enrichment: each purchase event carries the latest
    signup-state value known at its event time (stream-state correlation
    with retained history — the explicit form of client.ts:271-283).
    Implemented as the union-sort as-of join (operators/asof.py): one
    shuffle + one sort, no range explosion.

    The state side is first reduced to ONE row per (user_id, ts) — highest
    event_id wins — because asof_join's contract (operators/asof.py) says
    same-(key, ts) state rows have no defined winner, and DuckDB's ASOF
    JOIN is equally unspecified: without the dedup, two signups in the
    same millisecond could hash-mismatch between engines (latent on
    shipped data — no (user_id, ts) duplicates exist — but unguarded by
    construction)."""
    from beeper_matric_etl_tool_spark.operators.asof import asof_join
    from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    signups = latest_by_key(
        events.filter(F.col("event_type") == "signup").select(
            "user_id", "ts", "event_id", F.col("value").alias("signup_value")
        ),
        keys=["user_id", "ts"],
        order_by=[F.col("event_id").desc()],
    ).drop("event_id")
    return asof_join(
        purchases, signups, on=["user_id"], events_ts="ts", state_ts="ts",
        payload=["signup_value"],
    )


# (exact value quartiles are folded into `stats_summary` as scalar
# q25/q50/q75_value_cents columns)


# (rollup/cube/GROUPING() are all exercised by `orders_grouping_sets` —
# one CUBE query whose sets strictly contain the rollup's)


_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "segment_pivot_unpivot",
    tags=("A-ext",),
    oracle=f"""
        SELECT c_nationkey, segment, CAST(n AS BIGINT) AS n FROM (
            SELECT c_nationkey,
                   {", ".join(
                       f"count(*) FILTER (WHERE c_mktsegment = '{s}') AS {s.lower()}"
                       for s in _SEGMENTS
                   )}
            FROM customer GROUP BY c_nationkey
        ) UNPIVOT (n FOR segment IN ({", ".join(s.lower() for s in _SEGMENTS)}))
    """,
)
def segment_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) immediately unpivoted back (wide→long, the melt
    operator) — both reshape directions in one plan. The pivot value list
    is FIXED (an inferred list would be a separate distinct-scan job and
    nondeterministic column order); the unpivot preserves zero-count cells
    as rows, which re-deriving from a groupBy would drop."""
    wide = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .count()
        .select(
            "c_nationkey",
            *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS],
        )
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=[s.lower() for s in _SEGMENTS],
        variableColumnName="segment",
        valueColumnName="n",
    )


@register(
    "message_type_filter",
    tags=("P5", "P7"),
    oracle="""
        SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
)
def message_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P7 — the enum stream filters (`m.room.message` gate client.ts:276,
    invite-only gate client.ts:260) as a pushed-down equality predicate."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


# (timestamp rendering + row→JSON serialization ride `events_scalar_battery`)


@register(
    "shipping_priority",
    headline=True,
    tags=("A-scale", "J-scale"),
    oracle="""
        SELECT l.l_orderkey,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                 AS revenue_c4,
               o.o_orderdate, o.o_orderpriority
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_c4 DESC, l.l_orderkey
        LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: selective dimension filter broadcast-semi-reduces
    orders BEFORE the fact join; both date predicates push into the scans.

    The fact⋈fact join is hinted SHUFFLE_HASH with the reduced-orders side
    as build: neither side is broadcastable at 100 TB (a hard
    ``F.broadcast`` here would be an executor-OOM hazard at scale), but
    static stats can't see the two date filters' selectivity and — measured
    — pick a broadcast that hash-builds the LINEITEM side, the bigger one.
    The hint shuffles both sides on the order key and per-partition
    hash-builds the smaller, sort-free — the standard fact-fact shape, and
    ~2× faster than the stats-blind plan at bench scale."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    price_c = fx.cents(F.col("l_extendedprice"))
    disc_c = fx.cents(F.col("l_discount"))
    return (
        l.join(
            o.join(F.broadcast(c.select("c_custkey")), o["o_custkey"] == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
            .hint("SHUFFLE_HASH"),
            l["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price_c * (F.lit(100) - disc_c)).alias("revenue_c4"))
        .select("l_orderkey", "revenue_c4", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "regional_nation_volume",
    tags=("A-scale", "J-scale"),
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
                 AS revenue_c4
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
)
def regional_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 5-way star: the region→nation→customer dimension
    chain collapses to one broadcast before touching facts; only the
    orders⋈lineitem co-shuffle moves real data. Classic snowflake plan."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])),
               c["c_nationkey"] == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    price_c = fx.cents(F.col("l_extendedprice"))
    disc_c = fx.cents(F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(dims), o["o_custkey"] == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(price_c * (F.lit(100) - disc_c)).alias("revenue_c4"))
    )


@register(
    "running_user_totals",
    tags=("O-analytic",),
    oracle="""
        SELECT user_id, event_id, ts,
               row_number() OVER w AS seq,
               CAST(sum(cents) OVER w AS BIGINT) AS running_cents,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS ms_since_prev
        FROM (SELECT user_id, event_id, ts,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window analytics over the event stream: per-user sequence numbers,
    running spend, inter-event gaps — the per-entity timeline features a
    behavioral model trains on. One shuffle on the user key, sorted within
    partitions; all outputs exact integers under a total order."""

    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrow = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    cents = fx.cents(F.col("value"))
    return events.select(
        "user_id", "event_id", "ts",
        F.row_number().over(wrow).cast("long").alias("seq"),
        F.sum(cents).over(w).alias("running_cents"),
        (F.unix_millis(F.col("ts")) - F.lag(F.unix_millis(F.col("ts"))).over(wrow)).alias(
            "ms_since_prev"
        ),
    )


# (unpivot is the second half of `segment_pivot_unpivot`)


# (INTERSECT and EXCEPT are covered by `set_ops_suite`)


_DUAL_DIALECT_SQL = """
    SELECT e.user_id,
           count(*) AS n_purchases,
           CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id
"""


@register("sql_surface_purchases", tags=("SQL",), oracle=_DUAL_DIALECT_SQL)
def sql_surface_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface: THE SAME SQL string runs verbatim on Spark
    (over registered temp views) and on the DuckDB oracle — the dialect
    subset the engine guarantees portable. Catalyst plans it identically
    to the DataFrame form (one broadcast join, one partial-agg shuffle)."""
    from beeper_matric_etl_tool_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_DUAL_DIALECT_SQL)


# (props key introspection, null algebra and GROUPING() flags ride
# `events_scalar_battery` and `orders_grouping_sets`)


# (the second keyset page is folded into `messages_topk_page` — one
# registry slot covers the whole two-page O3 flow)
