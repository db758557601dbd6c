"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations




def _lsh_cte(n_tables: int, n_bits: int, source: str, dim: int = 64) -> str:
    """SQL CTE fragment replaying ``operators/similarity.py``'s deterministic
    hyperplane LSH over ``source (vec_id, embedding)`` bit-for-bit: the
    splitmix-style plane hash (HUGEINT guards the 32x32-bit products), sign
    buckets via ordered string_agg, and the candidate equi-join. Defines
    ``flat`` (unnested vectors), ``norms`` and ``cands (va < vb)``."""
    return f"""
    plane_raw AS (
      SELECT t.t AS table_id, b.b AS bit, i.i - 1 AS i,
             (t.t * 1000003 + b.b * 10007 + (i.i - 1) * 97 + 2654435769)
               % 4294967296 AS x
      FROM range(0, {n_tables}) t(t), range(0, {n_bits}) b(b),
           range(1, {dim + 1}) i(i)
    ), p1 AS (
      SELECT table_id, bit, i, xor(x, x >> 16) AS x FROM plane_raw
    ), p2 AS (
      SELECT table_id, bit, i,
             CAST((CAST(x AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS x
      FROM p1
    ), p3 AS (
      SELECT table_id, bit, i, xor(x, x >> 13) AS x FROM p2
    ), p4 AS (
      SELECT table_id, bit, i,
             CAST((CAST(x AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS x
      FROM p3
    ), planes AS (
      SELECT table_id, bit, i,
             (CAST(xor(x, x >> 16) AS DOUBLE) / 4294967295) * 2.0 - 1.0 AS w
      FROM p4
    ), flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM {source}, range(1, {dim + 1}) t(i)
    ), dots AS (
      SELECT f.vec_id, p.table_id, p.bit, sum(f.x * p.w) AS d
      FROM flat f JOIN planes p ON p.i = f.i
      GROUP BY 1, 2, 3
    ), sigs AS (
      SELECT vec_id, table_id,
             string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY bit)
               AS bucket
      FROM dots GROUP BY 1, 2
    ), cands AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM sigs a JOIN sigs b
        ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    )"""


_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


_MINHASH_AGGS_SQL = ",\n           ".join(
    f"min(md5(concat('h{i}:', shingle))) AS m{i}" for i in range(16)
)


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, md5(concat_ws('|', m{4*b}, m{4*b+1}, m{4*b+2}, m{4*b+3})) AS band_hash FROM sigs"
    for b in range(4)
)


_HEXMAP = "'0123456789abcdef'"


def _u32_sql(expr: str) -> str:
    """First 32 bits of md5(expr) as an integer, in portable ANSI-ish SQL
    (DuckDB has no hex-to-int conv); mirrors Spark's
    ``conv(substring(md5(expr), 1, 8), 16, 10)``."""
    return " + ".join(
        f"(strpos({_HEXMAP}, substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


def _u32_sql_at(expr: str, start: int) -> str:
    """32 md5 bits starting at hex digit ``start`` (1-based) as an integer —
    the offset twin of ``_u32_sql`` (mirrors Spark's
    ``conv(substring(md5(expr), start, 8), 16, 10)``)."""
    return " + ".join(
        f"(strpos({_HEXMAP}, substr(md5({expr}), {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
