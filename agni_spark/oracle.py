"""DuckDB-side mirror of agni_spark.datamodel's TSDB derivation.

The driver registers only the testdata tables as DuckDB views, so every
oracle query for a TSDB operator starts from this CTE prelude, which
derives `samples` / `series` / `series_labels` / `blocks` / `tombstones`
from `events` with EXACTLY the mapping in datamodel.derive_tsdb (keep
the two in sync — every TSDB oracle row in the differential gate
diff-checks them end-to-end)."""

PRELUDE = """
WITH ev AS (
  SELECT
    CASE event_type
      WHEN 'click' THEN 0 WHEN 'error' THEN 1 WHEN 'purchase' THEN 2
      WHEN 'signup' THEN 3 ELSE 4 END AS type_idx,
    user_id % 420 AS uid,
    event_type, ts, value
  FROM events
),
base AS (
  SELECT
    CAST(type_idx * 1000 + uid AS BIGINT) AS series_id,
    'event_' || event_type AS metric,
    CASE uid % 3 WHEN 0 THEN 'api' WHEN 1 THEN 'web' ELSE 'worker' END AS job,
    CASE uid % 2 WHEN 0 THEN 'prod' ELSE 'dev' END AS env,
    (CASE uid % 2 WHEN 0 THEN 'prod' ELSE 'dev' END) || '-' ||
      lpad(CAST(uid % 20 AS VARCHAR), 2, '0') AS instance,
    CASE WHEN uid % 5 < 3 THEN 'pod-' || CAST(uid % 7 AS VARCHAR) END AS pod,
    epoch_ms(ts) AS ts_ms,
    value
  FROM ev
),
samples AS (SELECT series_id, ts_ms, value FROM base),
series AS (
  SELECT DISTINCT series_id, metric, job, env, instance, pod FROM base
),
series_labels AS (
  SELECT series_id, name, value FROM (
    SELECT series_id, '__name__' AS name, metric AS value FROM series
    UNION ALL SELECT series_id, 'env', env FROM series
    UNION ALL SELECT series_id, 'instance', instance FROM series
    UNION ALL SELECT series_id, 'job', job FROM series
    UNION ALL SELECT series_id, 'pod', pod FROM series WHERE pod IS NOT NULL
  )
),
blocks AS (
  SELECT
    'BLK' || lpad(CAST(block_id AS VARCHAR), 23, '0') AS ulid,
    block_id,
    block_id * 7200000 AS mint_ms,
    (block_id + 1) * 7200000 AS maxt_ms,
    CAST(count(*) AS BIGINT) AS num_samples,
    CAST(count(DISTINCT series_id) AS BIGINT) AS num_series,
    CAST(CASE WHEN block_id % 9 = 0 THEN 2 ELSE 1 END AS INT) AS compaction_level
  FROM (
    SELECT CAST(ts_ms // 7200000 AS BIGINT) AS block_id, series_id FROM samples
  ) GROUP BY block_id
),
tombstones AS (
  SELECT CAST(i * 97 AS BIGINT) AS series_id,
         CAST(1704844800000 AS BIGINT) AS mint_ms,
         CAST(1704931199999 AS BIGINT) AS maxt_ms
  FROM generate_series(0, 51) t(i)
)
"""

# Shared query-time constants (mid-month window spanning many blocks).
T1 = 1704844800000  # 2024-01-10T00:00:00Z
T2 = 1705708799999  # 2024-01-19T23:59:59.999Z


def q(sql: str) -> str:
    """Prepend the TSDB derivation prelude to a SELECT."""
    return PRELUDE + sql
