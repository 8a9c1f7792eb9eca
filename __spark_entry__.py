"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 is exposed twice: as a
Spark DataFrame query (``queries()``) and as equivalent ANSI SQL that
DuckDB runs on the same parquet tables (``oracle_sql()``). The iterative
kernels (PageRank, WCC, LPA, SSSP, walks) have their oracles generated
as UNROLLED fixed-round SQL — unroll counts are sized from the measured
structure of the deterministic derived graph (see
planar_spark/testdata_graph.py): undirected eccentricity <= 8 at both
sf0.001/sf0.01, directed eccentricity <= 8 from the min vertex. SCC and
bow-tie use EXACT recursive-closure oracles instead (round-structure-
independent); wcc_incremental is value-hashed against the same
full-recompute oracle as the batch wcc gate. Every registered query has
a matching oracle — all gates are hard (rows + schema + value hash).

DuckDB 1.0 gotcha: inside WITH RECURSIVE, a sibling CTE whose body has
a TOP-LEVEL ``UNION`` silently behaves like UNION ALL — always nest the
UNION ALL under an outer SELECT DISTINCT there (see _bowtie_sql).

Graphs derived from the testdata:
- main graph:  src=l_orderkey%4096, dst=l_partkey%4096 (distinct, no
  self-loops) — 1 giant component.
- cc graph:    same, restricted to l_orderkey%8 == l_partkey%8 — >=8
  components so exact CC labels are a real test.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.tables import GraphTables
from planar_spark.ingest.build import dictionary_encode
from planar_spark.kernels import (
    connected_components,
    hits,
    label_propagation,
    pagerank,
)
from planar_spark.kernels.neighborhood import (
    WALK_H_A,
    WALK_H_B,
    WALK_H_C,
    WALK_H_D,
    WALK_H_E,
    WALK_H_MOD,
    khop_risk,
    one_hop_min,
    random_walk,
    two_hop_stats,
)
from planar_spark.kernels.sssp import bfs_sssp, sssp_with_unreached
from planar_spark.kernels.textops import (
    STOPWORDS,
    detect_language,
    embedding_ann_topk,
    embedding_topk,
    lsh_candidate_pairs,
    near_dup_clusters,
    quality_score,
    simhash,
    winnow_fingerprints,
)
from planar_spark.testdata_graph import V_MOD, derive_edges

# ---------------------------------------------------------------- config

PR_ITERS = 5
PR_DAMPING = 0.85
LPA_ROUNDS = 3
WCC_ORACLE_ROUNDS = 16   # >= max undirected eccentricity (measured: 15)
SSSP_ORACLE_ROUNDS = 12  # >= directed eccentricity from min vid (measured: 8)
WALK_STEPS = 4
N2V_WALKS = 3            # walks per start in the node2vec corpus gate
STREAM_TS_STEP = 13      # event-time stride: 500 docs -> ~11 ten-minute
                         # windows, well inside the 4h watermark
INF = 1_000_000_000


def _cfg() -> EngineConfig:
    return EngineConfig(num_partitions=16, tolerance=0.0, checkpoint_dir=None)


def _graph(spark: SparkSession, sf_dir: str) -> GraphTables:
    return GraphTables.from_edges(derive_edges(spark, sf_dir), num_partitions=16)


def _graph8(spark: SparkSession, sf_dir: str) -> GraphTables:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        li.where((F.col("l_orderkey") % 8) == (F.col("l_partkey") % 8))
        .select(
            (F.col("l_orderkey") % V_MOD).alias("src"),
            (F.col("l_partkey") % V_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return GraphTables.from_edges(e, num_partitions=16)


# ---------------------------------------------------------------- SQL CTEs

_EDGES = f"""
edges AS MATERIALIZED (
    SELECT DISTINCT (l_orderkey % {V_MOD}) AS src, (l_partkey % {V_MOD}) AS dst
    FROM lineitem
    WHERE (l_orderkey % {V_MOD}) <> (l_partkey % {V_MOD})
),
verts AS MATERIALIZED (
    SELECT DISTINCT v AS vid FROM (
        SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges
    )
)
""".strip()

_EDGES8 = f"""
edges AS MATERIALIZED (
    SELECT DISTINCT (l_orderkey % {V_MOD}) AS src, (l_partkey % {V_MOD}) AS dst
    FROM lineitem
    WHERE (l_orderkey % {V_MOD}) <> (l_partkey % {V_MOD})
      AND (l_orderkey % 8) = (l_partkey % 8)
),
verts AS MATERIALIZED (
    SELECT DISTINCT v AS vid FROM (
        SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges
    )
)
""".strip()

_UND = """
u AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
)
""".strip()


def _pagerank_sql() -> str:
    d = PR_DAMPING
    parts = [
        f"WITH {_EDGES},",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        "base AS MATERIALIZED (SELECT v.vid, COALESCE(g.outdeg, 0) AS outdeg"
        " FROM verts v LEFT JOIN deg g ON v.vid = g.vid),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "it0 AS MATERIALIZED (SELECT b.vid, b.outdeg, 1.0 / nv.n AS pr FROM base b CROSS JOIN nv)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        parts.append(
            f", dm{p} AS MATERIALIZED (SELECT COALESCE(SUM(pr), 0.0) AS m FROM it{p}"
            f" WHERE outdeg = 0)"
        )
        parts.append(
            f", ct{p} AS MATERIALIZED (SELECT e.dst AS vid, SUM(p.pr / p.outdeg) AS contrib"
            f" FROM edges e JOIN it{p} p ON e.src = p.vid"
            f" WHERE p.outdeg > 0 GROUP BY e.dst)"
        )
        parts.append(
            f", it{k} AS MATERIALIZED (SELECT b.vid, b.outdeg,"
            f" {1.0 - d} / nv.n + {d} * (COALESCE(c.contrib, 0.0) + m.m / nv.n) AS pr"
            f" FROM base b CROSS JOIN nv CROSS JOIN dm{p} m"
            f" LEFT JOIN ct{p} c ON b.vid = c.vid)"
        )
    parts.append(f"SELECT vid, ROUND(pr, 5) AS pr FROM it{PR_ITERS}")
    return "\n".join(parts)


PPR_SEED_MOD = 97


def _repetition_sql() -> str:
    """Mirror of textops.repetition_stats: word \\S+ tokens, bigram
    top-fraction and trigram duplicate-fraction per doc."""
    return r"""WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g2 AS MATERIALIZED (
    SELECT doc_id, t[i] || ' ' || t[i+1] AS g
    FROM toks, UNNEST(generate_series(1, LEN(t) - 1)) AS u(i)
    WHERE LEN(t) >= 2
),
b AS MATERIALIZED (
    SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS tot2 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g
    ) GROUP BY doc_id
),
g3 AS MATERIALIZED (
    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, UNNEST(generate_series(1, LEN(t) - 2)) AS u(i)
    WHERE LEN(t) >= 3
),
tr AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ndist,
           CAST(SUM(c) AS BIGINT) AS tot3 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g
    ) GROUP BY doc_id
)
SELECT k.doc_id, CAST(LEN(k.t) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(CAST(b.mx AS DOUBLE) / b.tot2, 0.0), 6)
           AS top_bigram_frac,
       ROUND(COALESCE(CAST(tr.tot3 - tr.ndist AS DOUBLE) / tr.tot3, 0.0), 6)
           AS dup_trigram_frac
FROM toks k
LEFT JOIN b ON k.doc_id = b.doc_id
LEFT JOIN tr ON k.doc_id = tr.doc_id"""


def _corpus_dedup_sql(n: int = 5) -> str:
    """Mirror of textops.corpus_ngram_dedup over shingles_df(n) —
    including the short-doc whole-text fallback."""
    return rf"""WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
sh AS MATERIALIZED (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS g
    FROM toks, UNNEST(generate_series(1, LEN(t) - {n - 1})) AS u(i)
    WHERE LEN(t) >= {n}
    UNION
    SELECT DISTINCT doc_id, array_to_string(t, ' ') AS g
    FROM toks WHERE LEN(t) < {n}
),
df AS MATERIALIZED (
    SELECT g, COUNT(*) AS dfreq FROM sh GROUP BY g
),
per AS MATERIALIZED (
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.dfreq > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
    FROM sh s JOIN df d ON s.g = d.g GROUP BY s.doc_id
)
SELECT doc_id, n_grams, n_dup_grams,
       ROUND(CAST(n_dup_grams AS DOUBLE) / n_grams, 6) AS dup_frac
FROM per"""


def _ppr_sql() -> str:
    """Unrolled personalized-PageRank oracle mirroring kernels/ppr.py:
    seed-restart teleport, dangling mass redistributed to the seeds."""
    d = PR_DAMPING
    parts = [
        f"WITH {_EDGES},",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg"
        " FROM edges GROUP BY src),",
        "seeds AS MATERIALIZED (SELECT vid FROM verts"
        f" WHERE vid % {PPR_SEED_MOD} = 0),",
        "ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds),",
        "base AS MATERIALIZED (SELECT v.vid, COALESCE(g.outdeg, 0) AS outdeg,"
        " CASE WHEN s.vid IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS reset"
        " FROM verts v CROSS JOIN ns"
        " LEFT JOIN deg g ON v.vid = g.vid"
        " LEFT JOIN seeds s ON v.vid = s.vid),",
        "it0 AS MATERIALIZED (SELECT vid, outdeg, reset, reset AS pr FROM base)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        parts.append(
            f", dm{p} AS MATERIALIZED (SELECT COALESCE(SUM(pr), 0.0) AS m"
            f" FROM it{p} WHERE outdeg = 0)"
        )
        parts.append(
            f", ct{p} AS MATERIALIZED (SELECT e.dst AS vid,"
            f" SUM(p.pr / p.outdeg) AS contrib"
            f" FROM edges e JOIN it{p} p ON e.src = p.vid"
            f" WHERE p.outdeg > 0 GROUP BY e.dst)"
        )
        parts.append(
            f", it{k} AS MATERIALIZED (SELECT b.vid, b.outdeg, b.reset,"
            f" {1.0 - d} * b.reset"
            f" + {d} * (COALESCE(c.contrib, 0.0) + m.m * b.reset) AS pr"
            f" FROM base b CROSS JOIN dm{p} m"
            f" LEFT JOIN ct{p} c ON b.vid = c.vid)"
        )
    parts.append(f"SELECT vid, ROUND(pr, 6) AS ppr FROM it{PR_ITERS}")
    return "\n".join(parts)


def _scc_sql() -> str:
    """EXACT (non-unrolled) SCC oracle: DuckDB recursive transitive
    closure; scc_id(u) = min over {u} ∪ {w : u↔w mutually reachable}.
    Independent of the kernel's round structure by construction."""
    return f"""WITH RECURSIVE {_EDGES},
reach(s, t) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.s, e.dst FROM reach r JOIN edges e ON r.t = e.src
),
pairs AS MATERIALIZED (
    SELECT a.s AS u, a.t AS w FROM reach a
    JOIN reach b ON a.s = b.t AND a.t = b.s
)
SELECT v.vid, LEAST(COALESCE(MIN(p.w), v.vid), v.vid) AS scc_id
FROM verts v LEFT JOIN pairs p ON v.vid = p.u GROUP BY v.vid"""


HOST_SQL_URLS = """
m AS MATERIALIZED (
    SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/d/'
           || CAST(doc_id AS VARCHAR) AS src_url,
           'https://WWW.h' || CAST((doc_id // 7) % 7 AS VARCHAR)
           || '.example/d/' || CAST((doc_id * 13 + 2) % 499 AS VARCHAR)
           AS dst_url
    FROM documents
)
""".strip()

_HOST_EXPR = (
    "CASE WHEN lower(regexp_extract({u},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) LIKE 'www.%'"
    " THEN substr(lower(regexp_extract({u},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), 5)"
    " ELSE lower(regexp_extract({u},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) END"
)

_HOST_GRAPH_SQL_BODY = (
    f"hg AS MATERIALIZED (SELECT"
    f" {_HOST_EXPR.format(u='src_url')} AS src_host,"
    f" {_HOST_EXPR.format(u='dst_url')} AS dst_host,"
    f" COUNT(*) AS weight FROM m GROUP BY src_host, dst_host)"
)


def _host_graph_sql() -> str:
    return (
        f"WITH {HOST_SQL_URLS},\n{_HOST_GRAPH_SQL_BODY}\n"
        "SELECT src_host, dst_host, weight FROM hg"
    )


def _host_pagerank_sql() -> str:
    """Unrolled weighted-PageRank oracle over the host graph, mirroring
    kernels/wpagerank.py: contrib = Σ w_uv * (pr_u / W_out(u))."""
    d = PR_DAMPING
    parts = [
        f"WITH {HOST_SQL_URLS},",
        _HOST_GRAPH_SQL_BODY + ",",
        "hv AS MATERIALIZED (SELECT DISTINCT h AS vid FROM ("
        "SELECT src_host AS h FROM hg UNION ALL SELECT dst_host FROM hg)),",
        "wo AS MATERIALIZED (SELECT src_host AS vid, SUM(weight) AS w_out"
        " FROM hg GROUP BY src_host),",
        "hb AS MATERIALIZED (SELECT v.vid,"
        " COALESCE(CAST(w.w_out AS DOUBLE), 0.0) AS w_out"
        " FROM hv v LEFT JOIN wo w ON v.vid = w.vid),",
        "hn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hv),",
        "ht0 AS MATERIALIZED (SELECT b.vid, b.w_out, 1.0 / hn.n AS pr"
        " FROM hb b CROSS JOIN hn)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        parts.append(
            f", hd{p} AS MATERIALIZED (SELECT COALESCE(SUM(pr), 0.0) AS m"
            f" FROM ht{p} WHERE w_out = 0)"
        )
        parts.append(
            f", hc{p} AS MATERIALIZED (SELECT e.dst_host AS vid,"
            f" SUM(e.weight * (p.pr / p.w_out)) AS contrib"
            f" FROM hg e JOIN ht{p} p ON e.src_host = p.vid"
            f" WHERE p.w_out > 0 GROUP BY e.dst_host)"
        )
        parts.append(
            f", ht{k} AS MATERIALIZED (SELECT b.vid, b.w_out,"
            f" {1.0 - d} / hn.n + {d} * (COALESCE(c.contrib, 0.0)"
            f" + m.m / hn.n) AS pr"
            f" FROM hb b CROSS JOIN hn CROSS JOIN hd{p} m"
            f" LEFT JOIN hc{p} c ON b.vid = c.vid)"
        )
    parts.append(f"SELECT vid, ROUND(pr, 6) AS pr FROM ht{PR_ITERS}")
    return "\n".join(parts)


BOWTIE_WCC_ROUNDS = 12  # >= undirected eccentricity of the main graph (8)


def _bowtie_sql() -> str:
    """Bow-tie oracle from the exact closure: core = largest SCC (tie:
    min id), in/out from directed reach, tendril from an unrolled
    min-label WCC, disconnected otherwise."""
    parts = [
        f"WITH RECURSIVE {_EDGES},",
        """reach(s, t) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.s, e.dst FROM reach r JOIN edges e ON r.t = e.src
),
pairs AS MATERIALIZED (
    SELECT a.s AS u, a.t AS w FROM reach a
    JOIN reach b ON a.s = b.t AND a.t = b.s
),
scc AS MATERIALIZED (
    SELECT v.vid, LEAST(COALESCE(MIN(p.w), v.vid), v.vid) AS scc_id
    FROM verts v LEFT JOIN pairs p ON v.vid = p.u GROUP BY v.vid
),
core_id AS MATERIALIZED (
    SELECT scc_id FROM (SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY scc_id)
    ORDER BY n DESC, scc_id ASC LIMIT 1
),
core AS MATERIALIZED (
    SELECT vid FROM scc WHERE scc_id = (SELECT scc_id FROM core_id)
),
fwd AS MATERIALIZED (
    -- NOTE: inside WITH RECURSIVE, DuckDB 1.0 treats a CTE body with a
    -- TOP-LEVEL `UNION` as recursive-shaped and does not dedup across
    -- the arms; nest the UNION ALL under an outer DISTINCT instead.
    SELECT DISTINCT vid FROM (
        SELECT r.t AS vid FROM reach r JOIN core c ON r.s = c.vid
        UNION ALL SELECT vid FROM core
    )
),
bwd AS MATERIALIZED (
    SELECT DISTINCT vid FROM (
        SELECT r.s AS vid FROM reach r JOIN core c ON r.t = c.vid
        UNION ALL SELECT vid FROM core
    )
),
s AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM edges
        UNION ALL SELECT dst, src FROM edges
    )
),
l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)""",
    ]
    for k in range(1, BOWTIE_WCC_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT s.b AS vid, MIN(l.label) AS ml"
            f" FROM s JOIN l{p} l ON s.a = l.vid GROUP BY s.b)"
        )
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT l.vid,"
            f" LEAST(l.label, COALESCE(m.ml, l.label)) AS label"
            f" FROM l{p} l LEFT JOIN m{k} m ON l.vid = m.vid)"
        )
    w = BOWTIE_WCC_ROUNDS
    parts.append(
        f""", core_wcc AS MATERIALIZED (
    SELECT MIN(l.label) AS lab FROM l{w} l JOIN core c ON l.vid = c.vid
)
SELECT v.vid,
       CASE WHEN c.vid IS NOT NULL THEN 'core'
            WHEN b.vid IS NOT NULL THEN 'in'
            WHEN f.vid IS NOT NULL THEN 'out'
            WHEN l.label = (SELECT lab FROM core_wcc) THEN 'tendril'
            ELSE 'disconnected' END AS region
FROM verts v
LEFT JOIN core c ON v.vid = c.vid
LEFT JOIN bwd b ON v.vid = b.vid
LEFT JOIN fwd f ON v.vid = f.vid
LEFT JOIN l{w} l ON v.vid = l.vid"""
    )
    return "\n".join(parts)


NF_RADIUS = 3


def _nf_sql() -> str:
    """Unrolled exact neighborhood-function oracle: distinct reachable
    pairs within NF_RADIUS hops, counted per source."""
    parts = [
        f"WITH {_EDGES},",
        "p0 AS MATERIALIZED (SELECT vid, vid AS t FROM verts)",
    ]
    for k in range(1, NF_RADIUS + 1):
        p = k - 1
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT DISTINCT vid, t FROM ("
            f"SELECT vid, t FROM p{p}"
            f" UNION ALL"
            f" SELECT p.vid, e.dst AS t FROM p{p} p JOIN edges e ON p.t = e.src"
            f"))"
        )
    parts.append(
        f"SELECT vid, COUNT(*) AS nf FROM p{NF_RADIUS} GROUP BY vid"
    )
    return "\n".join(parts)


DIST_RADIUS = 4


def _dist_hist_sql() -> str:
    """Exact directed distance histogram: level-k new-pair counts from
    the same unrolled reachable-pair CTEs as the NF oracle; trailing
    empty levels are dropped (BFS: an empty level ends the walk)."""
    parts = [
        f"WITH {_EDGES},",
        "p0 AS MATERIALIZED (SELECT vid, vid AS t FROM verts)",
    ]
    for k in range(1, DIST_RADIUS + 1):
        p = k - 1
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT DISTINCT vid, t FROM ("
            f"SELECT vid, t FROM p{p}"
            f" UNION ALL"
            f" SELECT p.vid, e.dst AS t FROM p{p} p JOIN edges e ON p.t = e.src"
            f"))"
        )
    rows = [
        "SELECT CAST(0 AS BIGINT) AS dist,"
        " CAST((SELECT COUNT(*) FROM p0) AS BIGINT) AS n_pairs"
    ]
    for k in range(1, DIST_RADIUS + 1):
        rows.append(
            f"SELECT CAST({k} AS BIGINT),"
            f" CAST((SELECT COUNT(*) FROM p{k}) AS BIGINT)"
            f" - CAST((SELECT COUNT(*) FROM p{k - 1}) AS BIGINT)"
        )
    parts.append(
        "SELECT dist, n_pairs FROM ("
        + "\nUNION ALL ".join(rows)
        + ") WHERE n_pairs > 0 OR dist = 0"
    )
    return "\n".join(parts)


# measured weighted-path hop depth: 9 rounds at sf0.001, 13 at sf0.01
# (weighted shortest paths take MORE hops than BFS when a long cheap
# path beats a short expensive one); extra unrolled Bellman-Ford
# rounds are idempotent at the fixpoint, so unroll measured+3
WSSSP_ORACLE_ROUNDS = 16


def _wsssp_sql() -> str:
    """Unrolled Bellman-Ford with the gate's deterministic edge weights
    w = (src*7 + dst*13) % 10 + 1, source = MIN vid, INF sentinel
    arithmetic identical to the BFS sssp oracle."""
    parts = [
        f"WITH {_EDGES},",
        "w AS MATERIALIZED (SELECT src, dst,"
        " (src * 7 + dst * 13) % 10 + 1 AS w FROM edges),",
        "s0 AS MATERIALIZED (SELECT MIN(vid) AS s FROM verts),",
        f"d0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = (SELECT s FROM s0)"
        f" THEN 0 ELSE {INF} END AS dist FROM verts)",
    ]
    for k in range(1, WSSSP_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT e.dst AS vid,"
            f" MIN(d.dist + e.w) AS nd"
            f" FROM w e JOIN d{p} d ON e.src = d.vid"
            f" WHERE d.dist < {INF} GROUP BY e.dst)"
        )
        parts.append(
            f", d{k} AS MATERIALIZED (SELECT d.vid,"
            f" LEAST(d.dist, COALESCE(m.nd, d.dist)) AS dist"
            f" FROM d{p} d LEFT JOIN m{k} m ON d.vid = m.vid)"
        )
    parts.append(
        f"SELECT vid, CAST(CASE WHEN dist >= {INF} THEN -1 ELSE dist END"
        f" AS BIGINT) AS dist FROM d{WSSSP_ORACLE_ROUNDS}"
    )
    return "\n".join(parts)


TRUSS_K = 4
# measured peeling rounds: 4 at sf0.001 AND sf0.01 (survivors
# 4226→202→60→60); extra unrolled rounds are idempotent at the
# fixpoint, so unroll measured+2 for margin
TRUSS_UNROLL = 6


def _ktruss_sql(k: int = TRUSS_K, rounds: int = TRUSS_UNROLL) -> str:
    """Unrolled k-truss peeling: per round, triangle supports over the
    previous round's edge set (x<y<z 3-join — enumeration order differs
    from the kernel's degree orientation but the triangle SET is
    identical), then keep edges with support >= k-2."""
    parts = [f"WITH {_EDGES},", _UND, ", e0 AS MATERIALIZED (SELECT a, b FROM u)"]
    for r in range(rounds):
        parts.append(
            f", t{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
            f" FROM e{r} e1 JOIN e{r} e2 ON e1.b = e2.a"
            f" JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        parts.append(
            f", s{r} AS MATERIALIZED (SELECT a, b, COUNT(*) AS s FROM ("
            f"SELECT x AS a, y AS b FROM t{r}"
            f" UNION ALL SELECT y AS a, z AS b FROM t{r}"
            f" UNION ALL SELECT x AS a, z AS b FROM t{r}) GROUP BY a, b)"
        )
        parts.append(
            f", e{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e"
            f" JOIN s{r} s ON e.a = s.a AND e.b = s.b WHERE s.s >= {k - 2})"
        )
    parts.append(f"SELECT a, b FROM e{rounds}")
    return "\n".join(parts)


def _harmonic_sql() -> str:
    """Truncated harmonic centrality from the same unrolled reachable-
    pair CTEs as the NF oracle: per-level per-vid counts, then ONE
    fixed left-to-right double expression Σ (n_k - n_{k-1})/k — the
    identical association order the Spark kernel uses, so the float
    sums are bit-for-bit equal."""
    parts = [
        f"WITH {_EDGES},",
        "p0 AS MATERIALIZED (SELECT vid, vid AS t FROM verts)",
    ]
    for k in range(1, NF_RADIUS + 1):
        p = k - 1
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT DISTINCT vid, t FROM ("
            f"SELECT vid, t FROM p{p}"
            f" UNION ALL"
            f" SELECT p.vid, e.dst AS t FROM p{p} p JOIN edges e ON p.t = e.src"
            f"))"
        )
    for k in range(NF_RADIUS + 1):
        parts.append(
            f", n{k} AS MATERIALIZED (SELECT vid, COUNT(*) AS c"
            f" FROM p{k} GROUP BY vid)"
        )
    expr = " + ".join(
        f"(COALESCE(n{k}.c, 0) - COALESCE(n{k - 1}.c, 0))"
        f" / CAST({k} AS DOUBLE)"
        for k in range(1, NF_RADIUS + 1)
    )
    joins = "".join(
        f" LEFT JOIN n{k} ON v.vid = n{k}.vid"
        for k in range(NF_RADIUS + 1)
    )
    parts.append(
        f"SELECT v.vid, ROUND({expr}, 6) AS harmonic FROM verts v{joins}"
    )
    return "\n".join(parts)


def _closeness_sql() -> str:
    """Truncated closeness from the same per-level count CTEs: reached
    and total-distance are exact integers, one double division at the
    end (see kernels/hyperball.closeness_centrality)."""
    head = _harmonic_sql().rsplit("SELECT v.vid, ROUND", 1)[0]
    reached = " + ".join(
        f"(COALESCE(n{k}.c, 0) - COALESCE(n{k - 1}.c, 0))"
        for k in range(1, NF_RADIUS + 1)
    )
    total = " + ".join(
        f"{k} * (COALESCE(n{k}.c, 0) - COALESCE(n{k - 1}.c, 0))"
        for k in range(1, NF_RADIUS + 1)
    )
    joins = "".join(
        f" LEFT JOIN n{k} ON v.vid = n{k}.vid"
        for k in range(NF_RADIUS + 1)
    )
    return (
        head
        + f"SELECT v.vid, CAST(1 + {reached} AS BIGINT) AS reached,\n"
        + f"ROUND(CASE WHEN ({total}) > 0 THEN"
        + f" CAST({reached} AS DOUBLE) / ({total})"
        + " ELSE 0.0 END, 6) AS closeness\n"
        + f"FROM verts v{joins}"
    )


BC_SOURCES = 8   # k-source Brandes sample size in the centrality gate
BC_DEPTH = 8     # >= max BFS depth from the top-8 sources (measured:
                 # 6 at sf0.001, 4 at sf0.01; extra levels are no-ops)


def _betweenness_sql() -> str:
    """Unrolled k-source Brandes (kernels/betweenness.py) — forward
    multi-source BFS levels carrying sigma path counts, then backward
    level-by-level dependency accumulation, then the Brandes-Pich
    |V|/k estimator scale. Sigma sums are exact integers in double;
    the delta ratio sums are rounded to 4 decimals on BOTH sides.
    Residual risk (same accepted class as the pagerank/ppr ROUND
    gates): a true value within ~1e-12 of a .00005 boundary could
    round apart across engines — P ~ |V| * 2e-9 per run; unlike
    harmonic/closeness there is no exact-integer sufficient statistic
    for Brandes deltas (non-dyadic sigma ratios)."""
    d_max = BC_DEPTH
    parts = [
        f"WITH {_EDGES},",
        "odeg AS MATERIALIZED (SELECT v.vid, COALESCE(d.c, 0) AS out_deg"
        " FROM verts v LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges"
        " GROUP BY src) d ON v.vid = d.src),",
        f"srcs AS MATERIALIZED (SELECT vid AS s FROM odeg"
        f" ORDER BY out_deg DESC, vid ASC LIMIT {BC_SOURCES}),",
        "f0 AS MATERIALIZED (SELECT s, s AS vid,"
        " CAST(1 AS DOUBLE) AS sigma FROM srcs),",
        "reach0 AS MATERIALIZED (SELECT s, vid, sigma, 0 AS depth FROM f0)",
    ]
    for k in range(1, d_max + 1):
        p = k - 1
        parts.append(
            f", c{k} AS (SELECT f.s, e.dst AS vid, SUM(f.sigma) AS sigma"
            f" FROM f{p} f JOIN edges e ON f.vid = e.src GROUP BY f.s, e.dst)"
        )
        parts.append(
            f", f{k} AS MATERIALIZED (SELECT c.s, c.vid, c.sigma FROM c{k} c"
            f" WHERE NOT EXISTS (SELECT 1 FROM reach{p} r"
            f" WHERE r.s = c.s AND r.vid = c.vid))"
        )
        parts.append(
            f", reach{k} AS MATERIALIZED (SELECT * FROM reach{p}"
            f" UNION ALL SELECT s, vid, sigma, {k} AS depth FROM f{k})"
        )
    parts.append(
        f", cur{d_max} AS MATERIALIZED (SELECT s, vid, sigma,"
        f" CAST(0 AS DOUBLE) AS delta FROM reach{d_max} WHERE depth = {d_max})"
    )
    for d in range(d_max - 1, -1, -1):
        parts.append(
            f", ct{d} AS (SELECT l.s, l.vid,"
            f" SUM(l.sigma / c.sigma * (1 + c.delta)) AS delta"
            f" FROM reach{d_max} l JOIN edges e ON l.vid = e.src"
            f" JOIN cur{d + 1} c ON c.s = l.s AND c.vid = e.dst"
            f" WHERE l.depth = {d} GROUP BY l.s, l.vid)"
        )
        parts.append(
            f", cur{d} AS MATERIALIZED (SELECT l.s, l.vid, l.sigma,"
            f" COALESCE(ct.delta, 0) AS delta FROM reach{d_max} l"
            f" LEFT JOIN ct{d} ct ON l.s = ct.s AND l.vid = ct.vid"
            f" WHERE l.depth = {d})"
        )
    allcur = " UNION ALL ".join(
        f"SELECT s, vid, delta FROM cur{d}" for d in range(d_max + 1)
    )
    parts.append(f", alldelta AS MATERIALIZED ({allcur})")
    parts.append(
        ", bcraw AS MATERIALIZED (SELECT vid, SUM(delta) AS bc"
        " FROM alldelta WHERE vid <> s GROUP BY vid)"
    )
    parts.append(
        f"SELECT v.vid, ROUND(COALESCE(b.bc, 0) *"
        f" ((SELECT COUNT(*) FROM verts) / CAST({BC_SOURCES} AS DOUBLE)), 4)"
        f" AS bc FROM verts v LEFT JOIN bcraw b ON v.vid = b.vid"
    )
    return "\n".join(parts)


LOUVAIN_ROUNDS = 8  # fixed unroll == the gate's max_move_rounds


def _louvain_sql() -> str:
    """Unrolled single-level Louvain (kernels/louvain.py with
    max_levels=1, max_move_rounds=LOUVAIN_ROUNDS) — per round: per-
    community degree totals, per-(vertex, neighbor-community) weight
    sums, the modularity-gain argmax with lowest-community tie-break,
    and the paired-complement hash move gate (round r gates the
    high-bit class of H(v, (r+1)//2) when r is odd, its complement
    when even). Cross-engine float parity is
    EXACT, not rounded: with w = 1 every dq input (k_vc, k_own, deg,
    tot, m) is an exact integer in double, the two divisions are IEEE
    correctly-rounded on identical operands, and both engines evaluate
    the same expression tree — so the argmax comparisons can never
    disagree. Rounds past the kernel's quiet-pair fixpoint are no-ops
    (a quiet pair covers every vertex with state unchanged, so no
    vertex wants to move and every later round is quiet too)."""
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM u"
        " UNION ALL SELECT b, a FROM u),",
        "ldeg AS MATERIALIZED (SELECT src AS vid,"
        " CAST(COUNT(*) AS DOUBLE) AS deg FROM sym GROUP BY src),",
        "mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM u),",
        "lc0 AS MATERIALIZED (SELECT vid, vid AS c FROM ldeg)",
    ]
    for r in range(1, LOUVAIN_ROUNDS + 1):
        p = r - 1
        parts.append(
            f", tt{r} AS MATERIALIZED (SELECT lc.c, SUM(d.deg) AS tot"
            f" FROM lc{p} lc JOIN ldeg d ON lc.vid = d.vid GROUP BY lc.c)"
        )
        parts.append(
            f", nb{r} AS MATERIALIZED (SELECT s.src AS vid, lc.c,"
            f" CAST(COUNT(*) AS DOUBLE) AS k_vc"
            f" FROM sym s JOIN lc{p} lc ON s.dst = lc.vid"
            f" GROUP BY s.src, lc.c)"
        )
        parts.append(
            f", gn{r} AS (SELECT n.vid, n.c, own.c AS c_own,"
            f" (n.k_vc - COALESCE(ko.k_vc, 0.0)) / mm.m"
            f" - d.deg * (t.tot - (town.tot - d.deg)) / (2.0 * mm.m * mm.m)"
            f" AS dq"
            f" FROM nb{r} n"
            f" JOIN lc{p} own ON n.vid = own.vid"
            f" JOIN tt{r} t ON n.c = t.c"
            f" JOIN ldeg d ON n.vid = d.vid"
            f" JOIN tt{r} town ON own.c = town.c"
            f" LEFT JOIN nb{r} ko ON n.vid = ko.vid AND ko.c = own.c"
            f" CROSS JOIN mm"
            f" WHERE n.c <> own.c)"
        )
        parts.append(
            f", bs{r} AS (SELECT vid, c AS c_new FROM"
            f" (SELECT vid, c, dq, ROW_NUMBER() OVER"
            f" (PARTITION BY vid ORDER BY dq DESC, c ASC) AS rn"
            f" FROM gn{r}) WHERE rn = 1 AND dq > 1e-12"
            f" AND ((vid * 2654435761 + {(r + 1) // 2} * 40503)"
            f" % 4294967296) {'>=' if r % 2 == 1 else '<'} 2147483648)"
        )
        parts.append(
            f", lc{r} AS MATERIALIZED (SELECT lc.vid,"
            f" COALESCE(b.c_new, lc.c) AS c"
            f" FROM lc{p} lc LEFT JOIN bs{r} b ON lc.vid = b.vid)"
        )
    parts.append(
        f"SELECT v.vid, COALESCE(lc.c, v.vid) AS community"
        f" FROM verts v LEFT JOIN lc{LOUVAIN_ROUNDS} lc ON v.vid = lc.vid"
    )
    return "\n".join(parts)


def _centrality_profile_sql() -> str:
    """harmonic + closeness (+ its reached count) + k-source Brandes
    betweenness melted to one (kind, vid, value) gate — each leg its
    standalone oracle as a CTE-in-subquery (the decomposition_profile
    consolidation pattern). Frees a registry slot vs the r5 separate
    harmonic/closeness gates while adding betweenness to the hard
    value-hash contract."""
    return f"""SELECT 'harmonic' AS kind, vid, harmonic AS value
FROM ({_harmonic_sql()})
UNION ALL
SELECT t.kind, c.vid, t.value FROM ({_closeness_sql()}) c
CROSS JOIN LATERAL (
    SELECT 'closeness' AS kind, c.closeness AS value
    UNION ALL
    SELECT 'closeness_reached', CAST(c.reached AS DOUBLE)
) t
UNION ALL
SELECT 'betweenness', vid, bc FROM ({_betweenness_sql()})"""


def _assortativity_sql() -> str:
    """Newman degree assortativity from exact-integer sufficient
    statistics (see kernels/graphstats.degree_assortativity)."""
    return f"""WITH {_EDGES},
{_UND},
sym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM u
    UNION ALL SELECT b AS src, a AS dst FROM u),
ud AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS d FROM sym GROUP BY src),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dx.d) AS DOUBLE) AS sx,
             CAST(SUM(dy.d) AS DOUBLE) AS sy,
             CAST(SUM(dx.d * dy.d) AS DOUBLE) AS sxy,
             CAST(SUM(dx.d * dx.d) AS DOUBLE) AS sxx,
             CAST(SUM(dy.d * dy.d) AS DOUBLE) AS syy
      FROM sym e JOIN ud dx ON e.src = dx.vid JOIN ud dy ON e.dst = dy.vid)
SELECT CAST(n AS BIGINT) AS n_ends,
       ROUND(CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) = 0
                  THEN NULL
                  ELSE (n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             END, 6) AS assortativity
FROM s"""


def _eff_diam_sql() -> str:
    """Interpolated 90%-effective-diameter: a prefix-sum + linear
    interpolation on top of the (already-gated) distance histogram.
    All float math forced to DOUBLE (DuckDB parses 0.9 as DECIMAL,
    whose multiply semantics differ from Spark's doubles)."""
    return f"""WITH hist AS MATERIALIZED ({_dist_hist_sql()}),
c AS (SELECT dist, n_pairs,
             SUM(n_pairs) OVER (ORDER BY dist) AS cum FROM hist),
tgt AS (SELECT CAST(0.9 AS DOUBLE) * SUM(n_pairs) AS target FROM hist),
hit AS (SELECT dist, n_pairs, cum - n_pairs AS prev
        FROM c, tgt WHERE cum >= target ORDER BY dist LIMIT 1)
SELECT CAST(0.9 AS DOUBLE) AS q,
       ROUND(CASE WHEN dist = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE dist - 1 + (target - prev) / n_pairs END,
             6) AS eff_diameter
FROM hit, tgt"""


HITS_ITERS = 4


def _hits_sql() -> str:
    """Unrolled HITS oracle mirroring kernels/hits.py exactly: per-phase
    L1 normalization of the INPUT column (per-vertex division before the
    gather sum), final L1 normalization of both columns."""
    parts = [
        f"WITH {_EDGES},",
        "s0 AS MATERIALIZED (SELECT vid, 1.0 AS hub, 0.0 AS auth FROM verts)",
    ]
    for k in range(1, HITS_ITERS + 1):
        p = k - 1
        parts.append(
            f", hs{k} AS MATERIALIZED (SELECT SUM(hub) AS s FROM s{p})"
        )
        parts.append(
            f", wv{k} AS MATERIALIZED (SELECT vid, hub / hs{k}.s AS w"
            f" FROM s{p} CROSS JOIN hs{k})"
        )
        parts.append(
            f", ac{k} AS MATERIALIZED (SELECT e.dst AS vid, SUM(w.w) AS c"
            f" FROM edges e JOIN wv{k} w ON e.src = w.vid GROUP BY e.dst)"
        )
        parts.append(
            f", sa{k} AS MATERIALIZED (SELECT s.vid, s.hub,"
            f" COALESCE(a.c, 0.0) AS auth"
            f" FROM s{p} s LEFT JOIN ac{k} a ON s.vid = a.vid)"
        )
        parts.append(
            f", as{k} AS MATERIALIZED (SELECT SUM(auth) AS s FROM sa{k})"
        )
        parts.append(
            f", wa{k} AS MATERIALIZED (SELECT vid, auth / as{k}.s AS w"
            f" FROM sa{k} CROSS JOIN as{k})"
        )
        parts.append(
            f", hc{k} AS MATERIALIZED (SELECT e.src AS vid, SUM(w.w) AS c"
            f" FROM edges e JOIN wa{k} w ON e.dst = w.vid GROUP BY e.src)"
        )
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT s.vid,"
            f" COALESCE(h.c, 0.0) AS hub, s.auth"
            f" FROM sa{k} s LEFT JOIN hc{k} h ON s.vid = h.vid)"
        )
    k = HITS_ITERS
    parts.append(
        f", fin AS MATERIALIZED (SELECT SUM(hub) AS hsum, SUM(auth) AS asum"
        f" FROM s{k})"
        f" SELECT vid, ROUND(hub / fin.hsum, 6) AS hub,"
        f" ROUND(auth / fin.asum, 6) AS auth FROM s{k} CROSS JOIN fin"
    )
    return "\n".join(parts)


def _wcc_sql() -> str:
    parts = [
        f"WITH {_EDGES8},",
        "s AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges"
        " UNION SELECT dst, src FROM edges),",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(1, WCC_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT s.b AS vid, MIN(l.label) AS ml"
            f" FROM s JOIN l{p} l ON s.a = l.vid GROUP BY s.b)"
        )
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT l.vid,"
            f" LEAST(l.label, COALESCE(m.ml, l.label)) AS label"
            f" FROM l{p} l LEFT JOIN m{k} m ON l.vid = m.vid)"
        )
    parts.append(f"SELECT vid, label FROM l{WCC_ORACLE_ROUNDS}")
    return "\n".join(parts)


def _lpa_sql() -> str:
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM u"
        " UNION ALL SELECT b, a FROM u),",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(1, LPA_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT s.dst AS vid, l.label, COUNT(*) AS n"
            f" FROM sym s JOIN l{p} l ON s.src = l.vid GROUP BY s.dst, l.label)"
        )
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT vid, label FROM ("
            f"SELECT vid, label, ROW_NUMBER() OVER"
            f" (PARTITION BY vid ORDER BY n DESC, label ASC) AS rn FROM c{k}"
            f") WHERE rn = 1)"
        )
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT l.vid, COALESCE(p.label, l.label) AS label"
            f" FROM l{p} l LEFT JOIN p{k} p ON l.vid = p.vid)"
        )
    parts.append(f"SELECT vid, label FROM l{LPA_ROUNDS}")
    return "\n".join(parts)


def _sssp_sql() -> str:
    parts = [
        f"WITH {_EDGES},",
        "s0 AS MATERIALIZED (SELECT MIN(vid) AS s FROM verts),",
        f"d0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = (SELECT s FROM s0)"
        f" THEN 0 ELSE {INF} END AS dist FROM verts)",
    ]
    for k in range(1, SSSP_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT e.dst AS vid, MIN(d.dist + 1) AS nd"
            f" FROM edges e JOIN d{p} d ON e.src = d.vid"
            f" WHERE d.dist < {INF} GROUP BY e.dst)"
        )
        parts.append(
            f", d{k} AS MATERIALIZED (SELECT d.vid,"
            f" LEAST(d.dist, COALESCE(m.nd, d.dist)) AS dist"
            f" FROM d{p} d LEFT JOIN m{k} m ON d.vid = m.vid)"
        )
    parts.append(
        f"SELECT vid, CAST(CASE WHEN dist >= {INF} THEN -1 ELSE dist END"
        f" AS BIGINT) AS dist FROM d{SSSP_ORACLE_ROUNDS}"
    )
    return "\n".join(parts)


GNN_LAYERS = 2


def _gnn_sql() -> str:
    """Unrolled GNN_LAYERS-layer GNN forward oracle (dim 8, seed 42).

    Mirrors kernels/gnn.py exactly, per layer: mean over {self} ∪
    {out-neighbors} divided by out_deg + 1, then relu(W_l · mean) —
    layer 1's relu output feeds layer 2's mean-aggregation unrounded;
    only the final layer rounds to 6 dp. Each seeded 8×8 weight matrix
    is inlined as repr()'d double literals (exact round-trip).
    """
    from planar_spark.kernels.gnn import seeded_weights

    ws = seeded_weights(8, GNN_LAYERS, 42)

    def wcte(li: int) -> str:
        vals = ",\n      ".join(
            ", ".join(f"({r}, {c}, {ws[li][r][c]!r})" for c in range(8))
            for r in range(8)
        )
        return f"w{li}(r, c, wt) AS (VALUES {vals})"

    parts = [
        f"WITH {_EDGES8},",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg"
        " FROM edges GROUP BY src),",
        "pos AS (SELECT UNNEST(generate_series(0, 7)) AS p),",
        "h0 AS MATERIALIZED (",
        "    SELECT v.vid, p.p AS pos,",
        "           CAST((v.vid * 31 + p.p) % 97 AS DOUBLE) / 97.0 AS val",
        "    FROM verts v CROSS JOIN pos p",
        "),",
        ",\n".join(wcte(li) for li in range(GNN_LAYERS)),
    ]
    for li in range(GNN_LAYERS):
        p = li  # input layer index
        parts.append(f""",
sm{li} AS MATERIALIZED (
    SELECT vid, pos, SUM(val) AS s FROM (
        SELECT vid, pos, val FROM h{p}
        UNION ALL
        SELECT e.src AS vid, f.pos, f.val FROM edges e JOIN h{p} f ON e.dst = f.vid
    ) GROUP BY vid, pos
),
mn{li} AS MATERIALIZED (
    SELECT s.vid, s.pos, s.s / (COALESCE(d.outdeg, 0) + 1) AS m
    FROM sm{li} s LEFT JOIN deg d ON s.vid = d.vid
),
h{li + 1} AS MATERIALIZED (
    SELECT m.vid, w.r AS pos, GREATEST(SUM(w.wt * m.m), 0.0) AS val
    FROM mn{li} m JOIN w{li} w ON w.c = m.pos
    GROUP BY m.vid, w.r
)""")
    parts.append(
        f"SELECT vid, CAST(pos AS BIGINT) AS pos, ROUND(val, 6) AS val"
        f" FROM h{GNN_LAYERS}"
    )
    return "\n".join(parts)


KCORE_K = 16
KCORE_ORACLE_ROUNDS = 20     # >= measured peeling rounds (4 at sf0.001, 2 at sf0.01)
COLORING_ORACLE_ROUNDS = 10  # >= measured speculative rounds at sf0.01 (6)
MSF_ORACLE_ROUNDS = 6        # >= measured Boruvka rounds at sf0.01 (4)
MSF_ORACLE_JUMPS = 6         # pointer-doubling unroll: collapses depth 2^6


def _kcore_sql() -> str:
    """Unrolled degree-peeling oracle for the k-core (k = KCORE_K).

    Over-unrolling past the fixpoint is a no-op, so the round count only
    needs to exceed the measured peeling depth."""
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM u"
        " UNION ALL SELECT b, a FROM u),",
        "a0 AS MATERIALIZED (SELECT vid FROM verts)",
    ]
    for r in range(1, KCORE_ORACLE_ROUNDS + 1):
        p = r - 1
        parts.append(
            f", a{r} AS MATERIALIZED (SELECT s.src AS vid FROM sym s"
            f" JOIN a{p} x ON s.src = x.vid JOIN a{p} y ON s.dst = y.vid"
            f" GROUP BY s.src HAVING COUNT(*) >= {KCORE_K})"
        )
    parts.append(
        f"SELECT v.vid, CAST(CASE WHEN a.vid IS NOT NULL THEN 1 ELSE 0 END"
        f" AS BIGINT) AS in_core"
        f" FROM verts v LEFT JOIN a{KCORE_ORACLE_ROUNDS} a ON v.vid = a.vid"
    )
    return "\n".join(parts)


# Ascending-peel unroll schedules for the decomposition oracles,
# sized from a driver-side python replica of the peel at BOTH test
# scales (max of sf0.001/sf0.01 measured per-level rounds, +1
# idempotent margin — rounds past a level's fixpoint are no-ops):
#   core:  sf0.001 max_core 7 (16 rounds), sf0.01 max_core 23 (46)
#   truss: max_truss 4, per-level rounds {3:1, 4:3, 5:1} at both SFs
#   densest: 5 passes at sf0.001, 9 at sf0.01 (eps=0.1)
CORE_DECOMP_LEVELS = {
    1: 1, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2, 7: 4, 8: 9, 9: 2, 10: 2,
    11: 2, 12: 2, 13: 2, 14: 2, 15: 2, 16: 2, 17: 2, 18: 4, 19: 3,
    20: 3, 21: 3, 22: 4, 23: 10, 24: 12,
}
TRUSS_DECOMP_LEVELS = {3: 2, 4: 5, 5: 2}
DENSEST_UNROLL = 11


def _core_decomp_sql() -> str:
    """Unrolled ascending-k core-number oracle: level k's fixpoint
    k-core is peeled from the (k-1)-core final set (the kernel's exact
    schedule — kcore.core_decomposition), and a vertex's core number is
    the largest k whose final k-core contains it (0 fill via the verts
    left join)."""
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM u"
        " UNION ALL SELECT b, a FROM u),",
        "c0 AS MATERIALIZED (SELECT vid FROM verts)",
    ]
    prev = "c0"
    finals = []
    for k, nrounds in sorted(CORE_DECOMP_LEVELS.items()):
        for r in range(1, nrounds + 1):
            name = f"c{k}_{r}"
            parts.append(
                f", {name} AS MATERIALIZED (SELECT s.src AS vid FROM sym s"
                f" JOIN {prev} x ON s.src = x.vid"
                f" JOIN {prev} y ON s.dst = y.vid"
                f" GROUP BY s.src HAVING COUNT(*) >= {k})"
            )
            prev = name
        finals.append((k, prev))
    tags = " UNION ALL ".join(
        f"SELECT vid, {k} AS k FROM {fin}" for k, fin in finals
    )
    parts.append(f", ctags AS MATERIALIZED ({tags})")
    parts.append(
        "SELECT v.vid, CAST(COALESCE(t.core, 0) AS BIGINT) AS core"
        " FROM verts v LEFT JOIN"
        " (SELECT vid, MAX(k) AS core FROM ctags GROUP BY vid) t"
        " ON v.vid = t.vid"
    )
    return "\n".join(parts)


def _truss_decomp_sql() -> str:
    """Unrolled ascending-k truss-number oracle: level k's fixpoint
    k-truss is support-peeled from the (k-1)-truss final edge set (the
    _ktruss_sql round shape per peel round), and an edge's truss number
    is the largest k whose final k-truss contains it (floor 2 — every
    undirected edge is trivially in the 2-truss)."""
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "e2f AS MATERIALIZED (SELECT a, b FROM u)",
    ]
    prev = "e2f"
    finals = [(2, "e2f")]
    for k, nrounds in sorted(TRUSS_DECOMP_LEVELS.items()):
        for r in range(1, nrounds + 1):
            t, s, e = f"tt{k}_{r}", f"ts{k}_{r}", f"te{k}_{r}"
            parts.append(
                f", {t} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y,"
                f" e2.b AS z FROM {prev} e1 JOIN {prev} e2 ON e1.b = e2.a"
                f" JOIN {prev} e3 ON e3.a = e1.a AND e3.b = e2.b)"
            )
            parts.append(
                f", {s} AS MATERIALIZED (SELECT a, b, COUNT(*) AS s FROM ("
                f"SELECT x AS a, y AS b FROM {t}"
                f" UNION ALL SELECT y AS a, z AS b FROM {t}"
                f" UNION ALL SELECT x AS a, z AS b FROM {t}) GROUP BY a, b)"
            )
            parts.append(
                f", {e} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e"
                f" JOIN {s} s ON e.a = s.a AND e.b = s.b"
                f" WHERE s.s >= {k - 2})"
            )
            prev = e
        finals.append((k, prev))
    tags = " UNION ALL ".join(
        f"SELECT a, b, {k} AS k FROM {fin}" for k, fin in finals
    )
    parts.append(f", ttags AS MATERIALIZED ({tags})")
    parts.append(
        "SELECT a, b, CAST(MAX(k) AS BIGINT) AS truss"
        " FROM ttags GROUP BY a, b"
    )
    return "\n".join(parts)


def _densest_sql(rounds: int = DENSEST_UNROLL, eps: float = 0.1) -> str:
    """Unrolled Bahmani 2(1+eps) peeling oracle: per pass, density
    m/n of the current edge set (both computed as exact integer counts,
    divided as doubles — bit-identical to the kernel's python floats),
    then keep vertices with degree > 2(1+eps)·density and semi-join
    both endpoints. The returned iterate is the FIRST pass achieving
    the max density (ORDER BY density DESC, r ASC — the kernel's
    strict-greater update). NULLIF guards the over-unrolled empty
    passes, which the m>0 filter drops from the density race."""
    tf = repr(2.0 * (1.0 + eps))
    parts = [
        f"WITH {_EDGES},",
        _UND + ",",
        "de0 AS MATERIALIZED (SELECT a, b FROM u)",
    ]
    dens_legs, mem_legs = [], []
    for r in range(rounds):
        parts.append(
            f", dg{r} AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM ("
            f"SELECT a AS v FROM de{r} UNION ALL SELECT b FROM de{r})"
            f" GROUP BY v)"
        )
        parts.append(
            f", dst{r} AS MATERIALIZED (SELECT"
            f" (SELECT COUNT(*) FROM de{r}) AS m,"
            f" (SELECT COUNT(*) FROM dg{r}) AS n)"
        )
        parts.append(
            f", de{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM de{r} e"
            f" JOIN dg{r} da ON e.a = da.v JOIN dg{r} db ON e.b = db.v"
            f" CROSS JOIN dst{r} s"
            f" WHERE da.d > {tf} * (CAST(s.m AS DOUBLE) / NULLIF(s.n, 0))"
            f" AND db.d > {tf} * (CAST(s.m AS DOUBLE) / NULLIF(s.n, 0)))"
        )
        dens_legs.append(
            f"SELECT {r} AS r, CAST(m AS DOUBLE) / n AS density"
            f" FROM dst{r} WHERE m > 0"
        )
        mem_legs.append(
            f"SELECT {r} AS r, a AS v FROM de{r}"
            f" UNION ALL SELECT {r}, b FROM de{r}"
        )
    parts.append(
        ", ddens AS MATERIALIZED (" + " UNION ALL ".join(dens_legs) + ")"
    )
    parts.append(
        ", dbest AS MATERIALIZED (SELECT r FROM ddens"
        " ORDER BY density DESC, r ASC LIMIT 1)"
    )
    parts.append(
        ", dmem AS MATERIALIZED (SELECT DISTINCT p.v FROM ("
        + " UNION ALL ".join(mem_legs)
        + ") p JOIN dbest ON p.r = dbest.r)"
    )
    parts.append(
        "SELECT v.vid, CAST(CASE WHEN dmem.v IS NOT NULL THEN 1 ELSE 0 END"
        " AS BIGINT) AS in_densest"
        " FROM verts v LEFT JOIN dmem ON v.vid = dmem.v"
    )
    return "\n".join(parts)


def _decomposition_profile_sql() -> str:
    """The three decomposition kernels melted to one
    (kind, k1, k2, value) gate — each leg is its standalone oracle as a
    CTE-in-subquery (the graph_profile consolidation pattern)."""
    return f"""SELECT 'core' AS kind, vid AS k1, CAST(-1 AS BIGINT) AS k2,
       core AS value
FROM ({_core_decomp_sql()})
UNION ALL
SELECT 'truss', a, b, truss FROM ({_truss_decomp_sql()})
UNION ALL
SELECT 'densest', vid, CAST(-1 AS BIGINT), in_densest
FROM ({_densest_sql()})"""


def _coloring_sql() -> str:
    """Unrolled deterministic Luby-style speculative coloring oracle
    (graph8), mirroring kernels/coloring.py round-exactly: per round,
    uncolored vertices propose the smallest free color at-or-after the
    hashed offset t(v,r) = H(v,r) mod 2*(|used|+1); adjacent same-color
    proposers resolve by priority (lower retries). Extra unrolled
    rounds beyond convergence are no-ops (empty todo)."""
    prio = "(({v} * 2654435761) % 4294967296)"
    pa, pb = prio.format(v="s.src"), prio.format(v="s.dst")
    parts = [
        f"WITH {_EDGES8},",
        _UND + ",",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM u"
        " UNION ALL SELECT b, a FROM u),",
        "c0 AS MATERIALIZED (SELECT vid, CAST(NULL AS BIGINT) AS color FROM verts)",
    ]
    for k in range(1, COLORING_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", td{k} AS (SELECT vid FROM c{p} WHERE color IS NULL)"
        )
        parts.append(
            f", u{k} AS MATERIALIZED (SELECT DISTINCT s.src AS vid,"
            f" c.color AS ncolor"
            f" FROM sym s JOIN td{k} t ON s.src = t.vid"
            f" JOIN c{p} c ON s.dst = c.vid WHERE c.color IS NOT NULL)"
        )
        parts.append(
            f", b{k} AS MATERIALIZED (SELECT t.vid,"
            f" COALESCE(st.n, 0) AS n_used,"
            f" (((t.vid * 2654435761) % 4294967296 + {k}) * 40503)"
            f" % 4294967296 % (2 * (COALESCE(st.n, 0) + 1)) AS toff"
            f" FROM td{k} t LEFT JOIN"
            f" (SELECT vid, COUNT(*) AS n FROM u{k} GROUP BY vid) st"
            f" ON t.vid = st.vid)"
        )
        parts.append(
            f", pr{k} AS MATERIALIZED (SELECT b.vid, MIN(g.c) AS pc"
            f" FROM b{k} b, UNNEST(generate_series(b.toff,"
            f" b.toff + b.n_used)) AS g(c)"
            f" WHERE NOT EXISTS (SELECT 1 FROM u{k} u"
            f" WHERE u.vid = b.vid AND u.ncolor = g.c)"
            f" GROUP BY b.vid)"
        )
        parts.append(
            f", lo{k} AS MATERIALIZED (SELECT DISTINCT s.src AS vid"
            f" FROM sym s"
            f" JOIN pr{k} p1 ON s.src = p1.vid"
            f" JOIN pr{k} p2 ON s.dst = p2.vid"
            f" WHERE p1.pc = p2.pc AND (({pb} > {pa})"
            f" OR (({pb} = {pa}) AND s.dst > s.src)))"
        )
        parts.append(
            f", cm{k} AS MATERIALIZED (SELECT vid, pc FROM pr{k}"
            f" WHERE vid NOT IN (SELECT vid FROM lo{k}))"
        )
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT c.vid,"
            f" COALESCE(c.color, m.pc) AS color"
            f" FROM c{p} c LEFT JOIN cm{k} m ON c.vid = m.vid)"
        )
    parts.append(f"SELECT vid, color FROM c{COLORING_ORACLE_ROUNDS}")
    return "\n".join(parts)


def _msf_sql(weighted: bool = False) -> str:
    """Unrolled Boruvka MSF oracle (graph8).

    The MSF under a strict TOTAL ORDER on edges is UNIQUE, so the
    oracle only has to be a correct MSF under the same order:

    - default: undirected edge (a, b) (a < b) ordered lexicographically
      — encoded as the scalar a*V_MOD+b, order-preserving because every
      vid is < V_MOD by construction (derived, not hard-coded, so a
      changed gate-graph derivation cannot silently corrupt the oracle);
    - weighted: real weight w(a,b) = (a*7 + b*13) % 100 + 1 (ties are
      common — the total order (w, a, b) resolves them), encoded
      order-preservingly as w*V_MOD^2 + a*V_MOD + b.

    Each round: per-component min incident edge, hook to min label,
    pointer-double to a fixpoint (unroll sized from measured depth).
    """
    wexpr = f"((a * 7 + b * 13) % 100 + 1)"
    enc = (
        f"({wexpr} * {V_MOD * V_MOD} + a * {V_MOD} + b)"
        if weighted
        else f"(a * {V_MOD} + b)"
    )
    parts = [
        f"WITH {_EDGES8},",
        _UND + ",",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    pick_names = []
    for k in range(1, MSF_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", lv{k} AS MATERIALIZED (SELECT u.a, u.b,"
            f" la.label AS ca, lb.label AS cb"
            f" FROM u JOIN l{p} la ON u.a = la.vid"
            f" JOIN l{p} lb ON u.b = lb.vid WHERE la.label <> lb.label)"
        )
        parts.append(
            f", pk{k} AS MATERIALIZED (SELECT DISTINCT"
            f" ((w // {V_MOD}) % {V_MOD}) AS a, (w % {V_MOD}) AS b FROM ("
            f"SELECT comp, MIN(w) AS w FROM ("
            f"SELECT ca AS comp, {enc} AS w FROM lv{k}"
            f" UNION ALL SELECT cb, {enc} FROM lv{k}"
            f") GROUP BY comp))"
        )
        pick_names.append(f"pk{k}")
        parts.append(
            f", mg{k} AS MATERIALIZED (SELECT comp, MIN(adopt) AS nl FROM ("
            f"SELECT la.label AS comp, lb.label AS adopt FROM pk{k} e"
            f" JOIN l{p} la ON e.a = la.vid JOIN l{p} lb ON e.b = lb.vid"
            f" UNION ALL"
            f" SELECT lb.label, la.label FROM pk{k} e"
            f" JOIN l{p} la ON e.a = la.vid JOIN l{p} lb ON e.b = lb.vid"
            f") GROUP BY comp)"
        )
        parts.append(
            f", j{k}_0 AS MATERIALIZED (SELECT l.vid,"
            f" LEAST(l.label, COALESCE(m.nl, l.label)) AS label"
            f" FROM l{p} l LEFT JOIN mg{k} m ON l.label = m.comp)"
        )
        for j in range(1, MSF_ORACLE_JUMPS + 1):
            parts.append(
                f", j{k}_{j} AS MATERIALIZED (SELECT c.vid, p2.label"
                f" FROM j{k}_{j - 1} c JOIN j{k}_{j - 1} p2 ON c.label = p2.vid)"
            )
        parts.append(
            f", l{k} AS MATERIALIZED"
            f" (SELECT vid, label FROM j{k}_{MSF_ORACLE_JUMPS})"
        )
    union = " UNION ".join(f"SELECT a, b FROM {n}" for n in pick_names)
    wcol = (
        f", CAST({wexpr} AS BIGINT) AS w" if weighted else ""
    )
    parts.append(
        f"SELECT DISTINCT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b"
        f"{wcol} FROM ({union})"
    )
    return "\n".join(parts)


def _random_walk_sql() -> str:
    parts = [
        f"WITH {_EDGES},",
        "w0 AS MATERIALIZED (SELECT vid AS start, vid AS cur FROM verts WHERE vid % 31 = 0)",
    ]
    for k in range(1, WALK_STEPS + 1):
        p = k - 1
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT w.start, w.cur, e.dst, ROW_NUMBER() OVER ("
            f"PARTITION BY w.start ORDER BY"
            f" ((w.cur * {WALK_H_A} + COALESCE(e.dst, 0) * {WALK_H_B}"
            f" + {k} * {WALK_H_C}) % {WALK_H_MOD}) ASC, e.dst ASC) AS rn"
            f" FROM w{p} w LEFT JOIN edges e ON w.cur = e.src)"
        )
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT start, COALESCE(dst, cur) AS cur FROM c{k}"
            f" WHERE rn = 1)"
        )
    parts.append(f"SELECT start, cur FROM w{WALK_STEPS}")
    return "\n".join(parts)


def _triad_sql() -> str:
    """Directed-triangle census over the x<y<z undirected triangle
    enumeration (role assignment is irrelevant: both counts are
    functions of the triangle as a set). Mapping x,y,z -> a,b,c."""
    exists = (
        lambda s, d: f"CAST(EXISTS (SELECT 1 FROM edges e"
        f" WHERE e.src = t.{s} AND e.dst = t.{d}) AS BIGINT)"
    )
    return f"""WITH {_EDGES},
{_UND},
t AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1
 JOIN u e2 ON e1.b = e2.a
 JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
fl AS MATERIALIZED (SELECT
 {exists('x', 'y')} AS f_ab, {exists('y', 'x')} AS f_ba,
 {exists('x', 'z')} AS f_ac, {exists('z', 'x')} AS f_ca,
 {exists('y', 'z')} AS f_bc, {exists('z', 'y')} AS f_cb
 FROM t)
SELECT CAST(COALESCE(SUM(f_ab * f_bc * f_ca + f_ba * f_cb * f_ac), 0)
       AS BIGINT) AS n_cyclic,
       CAST(COALESCE(SUM(f_ab * f_bc * f_ac + f_ac * f_cb * f_ab
                       + f_ba * f_ac * f_bc + f_bc * f_ca * f_ba
                       + f_ca * f_ab * f_cb + f_cb * f_ba * f_ca), 0)
       AS BIGINT) AS n_transitive
FROM fl"""


def _node2vec_sql(w_return: int = 1, w_common: int = 2, w_far: int = 1) -> str:
    """Unrolled deterministic node2vec walk corpus: N2V_WALKS walks per
    start (walk_id folded into the mixing hash, term walk_id*WALK_H_E),
    per step candidate transition weights (return / distance-1 / far vs
    the PREVIOUS vertex), integer-replicated candidates, and the same
    mixing-hash argmin as the Spark kernel (ORDER BY h, dst, rep ==
    the struct-min field order, per (start, walk_id))."""
    parts = [
        f"WITH {_EDGES},",
        "u2 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,"
        " GREATEST(src, dst) AS b FROM edges),",
        "adj AS MATERIALIZED (SELECT a AS p, b AS d FROM u2"
        " UNION ALL SELECT b AS p, a AS d FROM u2),",
        "w0 AS MATERIALIZED (SELECT vid AS start,"
        " CAST(u.wk AS BIGINT) AS wk, vid AS prev, vid AS cur"
        f" FROM verts, UNNEST(generate_series(0, {N2V_WALKS - 1})) AS u(wk)"
        " WHERE vid % 31 = 0)",
    ]
    for k in range(1, WALK_STEPS + 1):
        p = k - 1
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT w.start, w.wk, w.prev, w.cur,"
            f" e.dst,"
            f" CASE WHEN e.dst IS NULL THEN 1"
            f" WHEN e.dst = w.prev THEN {w_return}"
            f" WHEN EXISTS (SELECT 1 FROM adj"
            f" WHERE adj.p = w.prev AND adj.d = e.dst) THEN {w_common}"
            f" ELSE {w_far} END AS wt"
            f" FROM w{p} w LEFT JOIN edges e ON w.cur = e.src)"
        )
        parts.append(
            f", r{k} AS MATERIALIZED (SELECT start, wk, prev, cur, dst,"
            f" CAST(u.rep AS BIGINT) AS rep"
            f" FROM c{k}, UNNEST(generate_series(0, wt - 1)) AS u(rep))"
        )
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT start, wk, prev, cur, dst,"
            f" ROW_NUMBER() OVER (PARTITION BY start, wk ORDER BY"
            f" ((cur * {WALK_H_A} + COALESCE(dst, 0) * {WALK_H_B}"
            f" + {k} * {WALK_H_C} + rep * {WALK_H_D}"
            f" + wk * {WALK_H_E}) % {WALK_H_MOD}) ASC,"
            f" dst ASC, rep ASC) AS rn FROM r{k})"
        )
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT start, wk,"
            f" CASE WHEN dst IS NULL THEN prev ELSE cur END AS prev,"
            f" COALESCE(dst, cur) AS cur FROM s{k} WHERE rn = 1)"
        )
    parts.append(
        f"SELECT start, wk AS walk_id, cur FROM w{WALK_STEPS}"
    )
    return "\n".join(parts)


# MinHash/LSH oracle prelude: word 3-gram shingles (short docs -> whole
# token string), 8 salted-md5 min-hashes, 4 bands x 2 rows — mirrors
# planar_spark/kernels/textops.py exactly.
_MINHASH_HASHES = 8
_MINHASH_BANDS = 4
_MINHASH_CTES = (
    r"""WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS tokens FROM documents
),
sh AS MATERIALIZED (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT t.doc_id,
               array_to_string(t.tokens[u.i:u.i+2], ' ') AS shingle
        FROM toks t, UNNEST(generate_series(1, len(t.tokens) - 2)) AS u(i)
        WHERE len(t.tokens) >= 3
        UNION ALL
        SELECT doc_id, array_to_string(tokens, ' ')
        FROM toks WHERE len(tokens) < 3
    )
),
sig AS MATERIALIZED (
    SELECT doc_id,
"""
    + ",\n".join(
        f"           MIN(md5('{i}#' || shingle)) AS h{i}"
        for i in range(_MINHASH_HASHES)
    )
    + """
    FROM sh GROUP BY doc_id
),
buckets AS MATERIALIZED (
"""
    + "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, md5(h{2 * b} || '|' || h{2 * b + 1})"
        f" AS bkey FROM sig"
        for b in range(_MINHASH_BANDS)
    )
    + "\n)"
)


def _ann_sql(
    n_planes: int = 24, bands: int = 8, dim: int = 64,
    query_mod: int = 100, k: int = 5,
) -> str:
    """Bucketed ANN oracle: the hyperplane components are derived from
    md5 hex (exactly kernels/textops.py:ann_hyperplanes — both systems
    divide by powers of two, so the doubles match bit-for-bit)."""
    r = n_planes // bands
    return f"""WITH pl AS MATERIALIZED (
    SELECT i.i AS p, j.j AS d,
           (CAST(('0x' || substr(md5(i.i || ':' || j.j), 1, 15)) AS BIGINT)
            / 1152921504606846976.0) * 2.0 - 1.0 AS w
    FROM UNNEST(generate_series(0, {n_planes - 1})) AS i(i),
         UNNEST(generate_series(0, {dim - 1})) AS j(j)
),
nrm AS MATERIALIZED (
    SELECT vec_id, embedding,
           SQRT(list_aggregate(list_transform(list_zip(embedding, embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')) AS nrm
    FROM embeddings
),
dots AS MATERIALIZED (
    SELECT n.vec_id, pl.p,
           SUM(CAST(n.embedding[pl.d + 1] AS DOUBLE) * pl.w) AS dot
    FROM nrm n, pl GROUP BY n.vec_id, pl.p
),
bk AS MATERIALIZED (
    SELECT vec_id, p // {r} AS band,
           string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                      ORDER BY p) AS bkey
    FROM dots GROUP BY vec_id, p // {r}
),
cand AS MATERIALIZED (
    SELECT DISTINCT qb.vec_id AS q, nb.vec_id AS neighbor
    FROM bk qb JOIN bk nb ON qb.band = nb.band AND qb.bkey = nb.bkey
    WHERE qb.vec_id % {query_mod} = 0 AND qb.vec_id <> nb.vec_id
),
sims AS MATERIALIZED (
    SELECT c.q, c.neighbor,
           ROUND(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                 / (a.nrm * b.nrm), 4) AS sim
    FROM cand c JOIN nrm a ON a.vec_id = c.q JOIN nrm b ON b.vec_id = c.neighbor
)
SELECT q, neighbor, sim FROM (
    SELECT q, neighbor, sim,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, neighbor ASC) AS rn
    FROM sims
) WHERE rn <= {k}"""


def _sql_wordlist(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


def _quality_sql() -> str:
    en = _sql_wordlist("en")
    return rf"""WITH m AS MATERIALIZED (
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           CAST(LEN(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
           CAST(LEN(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                t -> t IN ({en}))) AS BIGINT) AS n_stop
    FROM documents
),
r AS MATERIALIZED (
    SELECT doc_id, n_chars, n_tokens,
           ROUND(n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE), 6) AS punct_ratio,
           ROUND(n_stop / CAST(GREATEST(n_tokens, 1) AS DOUBLE), 6) AS stop_ratio
    FROM m
)
SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio,
       ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) * 0.4
             + LEAST(stop_ratio * 4.0, 1.0) * 0.4
             + LEAST(punct_ratio * 20.0, 1.0) * 0.2, 6) AS score
FROM r"""


def _langid_sql() -> str:
    per = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, '{lang}' AS lang,"
        f" SUM(CASE WHEN tok IN ({_sql_wordlist(lang)}) THEN 1 ELSE 0 END)"
        f" AS hits FROM toks GROUP BY doc_id"
        for lang in sorted(STOPWORDS)
    )
    return rf"""WITH toks AS MATERIALIZED (
    SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
    FROM documents
),
per AS MATERIALIZED (
{per}
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang
FROM (
    SELECT doc_id, lang, hits,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, lang ASC) AS rn
    FROM per
) WHERE rn = 1"""


# The kernel iterates hash-min to a FIXPOINT (exact for any pair-graph
# diameter); the oracle's unroll only has to cover the gate data's
# actual diameter, with slack so the gate stays independent of the
# kernel's round count (measured pair-graph diameter at sf0.01: <= 2 —
# near-dup clusters are near-cliques; over-unrolling is a no-op).
_NEAR_DUP_ROUNDS = 8


def _near_dup_sql(threshold: float = 0.5) -> str:
    parts = [
        _MINHASH_CTES,
        r""", pairs AS MATERIALIZED (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM buckets l JOIN buckets r ON l.band = r.band AND l.bkey = r.bkey
    WHERE l.doc_id < r.doc_id
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
    SELECT p.a, p.b, COUNT(*) AS i
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.a
    JOIN sh sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
    GROUP BY p.a, p.b
),
e AS MATERIALIZED (
    SELECT p.a, p.b
    FROM pairs p
    LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    JOIN sizes za ON za.doc_id = p.a
    JOIN sizes zb ON zb.doc_id = p.b
    WHERE ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
                / (za.sz + zb.sz - COALESCE(i.i, 0)), 6) >= """
        + repr(threshold)
        + """
),
sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
                     UNION ALL SELECT b, a FROM e),
l0 AS MATERIALIZED (SELECT doc_id, doc_id AS label FROM documents)""",
    ]
    for k in range(1, _NEAR_DUP_ROUNDS + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT s.dst AS doc_id, MIN(l.label) AS ml"
            f" FROM sym s JOIN l{p} l ON s.src = l.doc_id GROUP BY s.dst)"
        )
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT l.doc_id,"
            f" LEAST(l.label, COALESCE(m.ml, l.label)) AS label"
            f" FROM l{p} l LEFT JOIN m{k} m ON l.doc_id = m.doc_id)"
        )
    parts.append(
        f"SELECT doc_id, label AS canonical_id FROM l{_NEAR_DUP_ROUNDS}"
    )
    return "\n".join(parts)


# ---------------------------------------------------------------- queries

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank on the sf0.001 derived link graph."""
    g = _graph(spark, "/root/testdata/sf0.001")
    result = pagerank(g, _cfg(), num_iterations=PR_ITERS)
    return result.state.select("vid", F.round("pr", 5).alias("pr"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_pagerank(spark, sf_dir):
        g = _graph(spark, sf_dir)
        r = pagerank(g, _cfg(), num_iterations=PR_ITERS)
        return r.state.select("vid", F.round("pr", 5).alias("pr"))

    def q_ppr(spark, sf_dir):
        from planar_spark.kernels.ppr import personalized_pagerank

        g = _graph(spark, sf_dir)
        seeds = g.vertices.select("vid").where(
            F.col("vid") % PPR_SEED_MOD == 0
        )
        r = personalized_pagerank(g, seeds, _cfg(), num_iterations=PR_ITERS)
        return r.state.select("vid", F.round("ppr", 6).alias("ppr"))

    def q_scc(spark, sf_dir):
        from planar_spark.kernels.scc import strongly_connected_components

        g = _graph(spark, sf_dir)
        return strongly_connected_components(g, _cfg())

    def q_neighborhood_function(spark, sf_dir):
        from planar_spark.kernels.hyperball import neighborhood_function_exact

        g = _graph(spark, sf_dir)
        return neighborhood_function_exact(g, NF_RADIUS, _cfg())

    def q_distance_histogram(spark, sf_dir):
        from planar_spark.kernels.hyperball import distance_histogram

        g = _graph(spark, sf_dir)
        return distance_histogram(g, DIST_RADIUS, _cfg())

    def q_sssp_weighted(spark, sf_dir):
        from planar_spark.kernels.sssp import weighted_sssp

        g = _graph(spark, sf_dir)
        source = g.vertices.agg(F.min("vid")).collect()[0][0]
        w = g.edges.select(
            "src",
            "dst",
            ((F.col("src") * 7 + F.col("dst") * 13) % 10 + 1).alias("w"),
        )
        return weighted_sssp(g, int(source), _cfg(), weights=w)

    def q_ktruss(spark, sf_dir):
        from planar_spark.kernels.truss import k_truss

        g = _graph(spark, sf_dir)
        return k_truss(g, TRUSS_K, _cfg())

    def q_triad_census(spark, sf_dir):
        from planar_spark.kernels.graphstats import triad_census

        g = _graph(spark, sf_dir)
        return triad_census(g, _cfg())

    def q_centrality_profile(spark, sf_dir):
        # consolidated gate (r6): truncated harmonic + closeness (the
        # r5 separate gates) + k-source Brandes betweenness melted to
        # (kind, vid, value) — one hard value-hash for all three
        # centrality kernels. Floats are rounded identically on both
        # sides (6 dp for the level-sum centralities, 4 dp for the
        # betweenness delta ratios) so association-order noise never
        # flips a value.
        from planar_spark.kernels.betweenness import betweenness
        from planar_spark.kernels.hyperball import (
            closeness_centrality,
            harmonic_centrality,
        )

        g = _graph(spark, sf_dir)
        cfg = _cfg()
        harm = harmonic_centrality(g, NF_RADIUS, cfg).select(
            F.lit("harmonic").alias("kind"),
            "vid",
            F.round("harmonic", 6).alias("value"),
        )
        clo_df = closeness_centrality(g, NF_RADIUS, cfg)
        clo = clo_df.select(
            F.lit("closeness").alias("kind"),
            "vid",
            F.round("closeness", 6).alias("value"),
        )
        crc = clo_df.select(
            F.lit("closeness_reached").alias("kind"),
            "vid",
            F.col("reached").cast("double").alias("value"),
        )
        bc = betweenness(
            g, num_sources=BC_SOURCES, estimate=True, config=cfg
        ).select(
            F.lit("betweenness").alias("kind"),
            "vid",
            F.round("bc", 4).alias("value"),
        )
        return harm.unionAll(clo).unionAll(crc).unionAll(bc)

    def q_effective_diameter(spark, sf_dir):
        from planar_spark.kernels.hyperball import effective_diameter

        g = _graph(spark, sf_dir)
        return effective_diameter(g, DIST_RADIUS, q=0.9, config=_cfg())

    def q_pagerank_warmstart(spark, sf_dir):
        """Warm-start path: run 2 cold supersteps, then restart pagerank
        from that state for the remaining 3 — step-continuation must be
        exact, so the oracle is the SAME 5-iteration unrolled SQL as the
        cold pagerank gate."""
        g = _graph(spark, sf_dir)
        head = pagerank(g, _cfg(), num_iterations=2)
        tail = pagerank(
            g,
            _cfg(),
            num_iterations=PR_ITERS - 2,
            init_ranks=head.state.select("vid", "pr"),
        )
        return tail.state.select("vid", F.round("pr", 5).alias("pr"))

    def q_pagerank_locality(spark, sf_dir):
        """The BASELINE metric kernel on a with_partitioning locality
        layout (r7): region-major relabel -> block-pinned gather
        (salted_gather_join block mode, zero edge-side exchange) ->
        results mapped back through the relabel mapping. Must
        hash-match the SAME 5-iteration unrolled SQL as the plain
        pagerank gate — the layout changes the physical plan only.
        locality_min_edges=0 pins the block-pinned gather: the r8
        production default falls back to the hash gather below
        exchange-bound scale, but this gate exists to keep the pinned
        code path value-checked."""
        import dataclasses

        g = _graph(spark, sf_dir)
        g2, mapping = g.with_partitioning(
            "bfs_vertex_cut", num_partitions=_cfg().num_partitions
        )
        cfg = dataclasses.replace(_cfg(), locality_min_edges=0)
        r = pagerank(g2, cfg, num_iterations=PR_ITERS)
        return (
            r.state.join(
                mapping.select(
                    F.col("new_vid").alias("vid"),
                    F.col("vid").alias("_ov"),
                ),
                "vid",
            )
            .select(
                F.col("_ov").alias("vid"), F.round("pr", 5).alias("pr")
            )
        )

    def q_bowtie(spark, sf_dir):
        from planar_spark.kernels.scc import bowtie_regions

        g = _graph(spark, sf_dir)
        return bowtie_regions(g, _cfg())

    def q_hits(spark, sf_dir):
        g = _graph(spark, sf_dir)
        r = hits(g, _cfg(), num_iterations=HITS_ITERS)
        return r.state.select(
            "vid", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
        )

    def q_wcc(spark, sf_dir):
        g = _graph8(spark, sf_dir)
        # two-hop-seeded init (O14): fewer supersteps, identical labels
        r = connected_components(g, _cfg(), two_hop_init=True)
        return r.state.select("vid", "label")

    def q_wcc_boruvka(spark, sf_dir):
        # r6 mode gate: the O(log V)-guaranteed Boruvka components path
        # (hook-to-min + full pointer doubling + contraction) must
        # produce byte-identical labels to the hash-min kernel and the
        # same 16-round unrolled SQL oracle.
        g = _graph8(spark, sf_dir)
        r = connected_components(g, _cfg(), algorithm="boruvka")
        return r.state.select("vid", "label")

    def q_wcc_incremental(spark, sf_dir):
        """Split graph8's edges into an 'old' batch and a 'new' delta,
        compute exact labels for the old set, then MERGE the delta via
        the incremental label-contraction path. Oracle = the same full
        16-round WCC SQL as the batch wcc gate: the incremental path
        must be bit-identical to a full recompute on old ∪ new."""
        from planar_spark.kernels.components import incremental_wcc

        g = _graph8(spark, sf_dir)
        old_e = g.edges.where((F.col("src") + F.col("dst")) % 3 != 0)
        new_e = g.edges.where((F.col("src") + F.col("dst")) % 3 == 0)
        g_old = GraphTables.from_edges(
            old_e, num_partitions=16, vertices=g.vertices
        )
        old_labels = connected_components(
            g_old, _cfg(), two_hop_init=True
        ).state
        out = incremental_wcc(old_labels, new_e, _cfg())
        g_old.unpersist()
        return out.select("vid", "label")

    def q_lpa(spark, sf_dir):
        g = _graph(spark, sf_dir)
        r = label_propagation(g, _cfg(), num_iterations=LPA_ROUNDS)
        return r.state.select("vid", "label")

    def q_local_clustering(spark, sf_dir):
        from planar_spark.kernels.triangles import local_clustering

        g = _graph(spark, sf_dir)
        lcc = local_clustering(g, _cfg())
        return lcc.select(
            "vid", "triangles", "udeg", F.round("lcc", 6).alias("lcc")
        )

    def q_decomposition_profile(spark, sf_dir):
        # consolidated gate (r6): the three decomposition kernels
        # melted to (kind, k1, k2, value) — core numbers (per vid),
        # truss numbers (per undirected edge) and the densest-subgraph
        # membership, one hard value-hash for all three ascending-peel
        # kernels (k2 = -1 fill on the vertex-keyed legs).
        from planar_spark.kernels.densest import densest_subgraph
        from planar_spark.kernels.kcore import core_decomposition
        from planar_spark.kernels.truss import truss_decomposition

        g = _graph(spark, sf_dir)
        cfg = _cfg()
        core = core_decomposition(g, cfg).select(
            F.lit("core").alias("kind"),
            F.col("vid").alias("k1"),
            F.lit(-1).cast("long").alias("k2"),
            F.col("core").cast("long").alias("value"),
        )
        truss = truss_decomposition(g, cfg).select(
            F.lit("truss").alias("kind"),
            F.col("a").alias("k1"),
            F.col("b").alias("k2"),
            F.col("truss").cast("long").alias("value"),
        )
        dens = densest_subgraph(g, cfg).select(
            F.lit("densest").alias("kind"),
            F.col("vid").alias("k1"),
            F.lit(-1).cast("long").alias("k2"),
            F.col("in_densest").cast("long").alias("value"),
        )
        return core.unionAll(truss).unionAll(dens)

    def q_louvain(spark, sf_dir):
        # single-level fixed-round Louvain (r6): max_move_rounds ==
        # the oracle's unroll count, max_levels=1 — both sides run the
        # same deterministic move rounds (see _louvain_sql's float-
        # parity argument; extra rounds past the kernel's quiet-pair
        # fixpoint are no-ops, so early termination cannot diverge).
        from planar_spark.kernels.louvain import louvain

        g = _graph(spark, sf_dir)
        return louvain(
            g, _cfg(), max_move_rounds=LOUVAIN_ROUNDS, max_levels=1
        )

    def q_graph_profile(spark, sf_dir):
        # consolidated gate (r5): the one-pass graph profile — degree
        # histogram + reciprocity + power-law MLE + assortativity
        # melted to (stat, key, value) rows, the same shape as
        # jobs/run_kernel.py's `stats` kernel. One hard gate
        # value-hashes all four graphstats kernels.
        from planar_spark.kernels.graphstats import (
            degree_assortativity,
            degree_histogram,
            powerlaw_alpha,
            reciprocity,
        )

        g = _graph(spark, sf_dir)

        def melt(df, stat, cols):
            parts = [
                df.select(
                    F.lit(stat).alias("stat"),
                    F.lit(key).alias("key"),
                    F.col(c).cast("double").alias("value"),
                )
                for key, c in cols
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            return out

        h = degree_histogram(g).select(
            F.lit("degree_histogram").alias("stat"),
            F.col("bucket").cast("string").alias("key"),
            F.col("n_vertices").cast("double").alias("value"),
        )
        r = melt(
            reciprocity(g),
            "reciprocity",
            [
                ("n_edges", "n_edges"),
                ("n_reciprocal", "n_reciprocal"),
                ("ratio", "reciprocity"),
            ],
        )
        p = melt(
            powerlaw_alpha(g, dmin=2),
            "powerlaw",
            [("n_tail", "n_tail"), ("alpha", "alpha")],
        )
        a = melt(
            degree_assortativity(g),
            "assortativity",
            [("n_ends", "n_ends"), ("pearson_r", "assortativity")],
        )
        # r6 consolidation: deterministic edge sampling folds in as
        # ('edge_sample', src, dst) rows — frees the standalone
        # edge_sample slot for the louvain gate; the md5-bucket
        # filter stays fully value-hashed (every kept edge is a row)
        from planar_spark.kernels.graphstats import sample_edges

        es = sample_edges(g.edges.select("src", "dst"), pct=20).select(
            F.lit("edge_sample").alias("stat"),
            F.col("src").cast("string").alias("key"),
            F.col("dst").cast("double").alias("value"),
        )
        return h.unionAll(r).unionAll(p).unionAll(a).unionAll(es)

    def q_two_hop_stats(spark, sf_dir):
        # consolidated gate (r5: one-hop WriteMin; r6: P20's out-degree
        # accessor folds in too, widening the gate to ALL vertices —
        # -1 fill where a vertex has no 2-hop path / no out-neighbor,
        # so one hard value-hash covers two-hop, one-hop AND degrees)
        # the three legs join INDEPENDENTLY: a vertex whose only
        # neighbors are sinks has one-hop/degree rows but no two-hop
        # row, so chaining through the two-hop set would drop them
        g = _graph(spark, sf_dir)
        return (
            g.vertices.select("vid")
            .join(two_hop_stats(g), "vid", "left")
            .join(one_hop_min(g), "vid", "left")
            .join(g.degrees.select("vid", "out_deg"), "vid", "left")
            .select(
                "vid",
                F.coalesce("min_two_hop", F.lit(-1)).alias("min_two_hop"),
                F.coalesce("max_two_hop", F.lit(-1)).alias("max_two_hop"),
                F.coalesce("min_nbr", F.lit(-1)).alias("min_nbr"),
                F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            )
        )

    def q_sssp(spark, sf_dir):
        g = _graph(spark, sf_dir)
        source = g.vertices.agg(F.min("vid")).collect()[0][0]
        r = bfs_sssp(g, int(source), _cfg())
        return sssp_with_unreached(g, r.state)

    def q_khop_risk(spark, sf_dir):
        return khop_risk(_graph(spark, sf_dir))

    def q_random_walk(spark, sf_dir):
        return random_walk(_graph(spark, sf_dir), _cfg(), num_steps=WALK_STEPS)

    def q_node2vec_walk(spark, sf_dir):
        from planar_spark.kernels.neighborhood import node2vec_walk

        return node2vec_walk(
            _graph(spark, sf_dir), _cfg(), num_steps=WALK_STEPS,
            num_walks=N2V_WALKS,
        )

    def q_dict_encode(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        urls = docs.select(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("url")
        )
        return dictionary_encode(urls, num_partitions=16)

    def q_dedup_exact(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.groupBy(F.md5("text").alias("text_hash")).agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )

    def q_token_stats(spark, sf_dir):
        # whitespace tokens + a BPE-ish wordpiece count (letter runs,
        # digit runs, and lone symbols — the pre-merge unit count a BPE
        # tokenizer would start from)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        wp_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
        return docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0)))
            .cast("long")
            .alias("n_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(wp_re), F.lit(0)))
            .cast("long")
            .alias("n_wordpieces"),
        )

    def q_lang_stats(spark, sf_dir):
        # consolidated gate (r5): groups by the DETECTED language, so
        # one hard gate value-hashes both the stopword language-ID
        # kernel (textops.detect_language) and the corpus aggregation
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pred = detect_language(docs)
        return (
            docs.join(pred, "doc_id")
            .groupBy("pred_lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
        )

    def q_minhash_lsh_pairs(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return lsh_candidate_pairs(docs, n=3, num_hashes=8, bands=4)

    def q_embedding_topk(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return embedding_topk(emb, query_mod=100, k=5)

    def q_embedding_ann_topk(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return embedding_ann_topk(emb, query_mod=100, k=5)

    def q_repetition_stats(spark, sf_dir):
        from planar_spark.kernels.textops import repetition_stats

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return repetition_stats(docs)

    def q_corpus_ngram_dedup(spark, sf_dir):
        from planar_spark.kernels.textops import corpus_ngram_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return corpus_ngram_dedup(docs, n=5)

    def q_doc_sample(spark, sf_dir):
        from planar_spark.kernels.textops import sample_documents

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return sample_documents(
            docs, rates={"en": 50, "de": 25, "fr": 10}, default_pct=5
        )

    def q_top_ngrams(spark, sf_dir):
        from planar_spark.kernels.textops import top_ngrams

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return top_ngrams(docs, n=3, k=20)

    def q_url_normalize(spark, sf_dir):
        from planar_spark.ingest.urls import normalize_urls

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        messy = docs.select(
            "doc_id",
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper("source"),
                F.lit(".Example/Doc/"),
                F.col("doc_id").cast("string"),
                F.lit("/?utm_source=x#frag"),
            ).alias("url"),
        )
        return normalize_urls(messy).select("doc_id", "url_norm")

    def _host_url_edges(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.select(
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example/d/"),
                F.col("doc_id").cast("string"),
            ).alias("src_url"),
            F.concat(
                F.lit("https://WWW.h"),
                (F.floor(F.col("doc_id") / F.lit(7)).cast("long") % 7)
                .cast("string"),
                F.lit(".example/d/"),
                ((F.col("doc_id") * 13 + 2) % 499).cast("string"),
            ).alias("dst_url"),
        )

    def q_host_graph(spark, sf_dir):
        from planar_spark.ingest.urls import host_graph

        return host_graph(_host_url_edges(spark, sf_dir))

    def q_host_pagerank(spark, sf_dir):
        from planar_spark.ingest.urls import host_graph
        from planar_spark.kernels.wpagerank import weighted_pagerank

        hg = host_graph(_host_url_edges(spark, sf_dir))
        pr = weighted_pagerank(
            hg,
            _cfg(),
            num_iterations=PR_ITERS,
            src_col="src_host",
            dst_col="dst_host",
        )
        return pr.select("vid", F.round("pr", 6).alias("pr"))

    def q_quality_score(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return quality_score(docs)

    def q_dedup_near_clusters(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return near_dup_clusters(docs)

    def q_fingerprints(spark, sf_dir):
        # consolidated gate (r5): SimHash + winnowing fingerprints
        # unioned under a kind column — one hard gate, both kernels
        # value-hashed (they share no code path past tokenization)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = simhash(docs, bits=32).select(
            "doc_id",
            F.lit("simhash").alias("kind"),
            F.col("simhash").alias("fp"),
        )
        wf = winnow_fingerprints(docs, k=5, window=4).select(
            "doc_id", F.lit("winnow").alias("kind"), F.col("fp")
        )
        return sh.unionAll(wf)

    def q_msf(spark, sf_dir):
        from planar_spark.kernels.mst import boruvka_msf

        return boruvka_msf(_graph8(spark, sf_dir), _cfg())

    def q_msf_weighted(spark, sf_dir):
        from planar_spark.kernels.mst import boruvka_msf

        g = _graph8(spark, sf_dir)
        wdf = g.undirected_edges().select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            ((F.col("a") * 7 + F.col("b") * 13) % 100 + 1).alias("w"),
        )
        return boruvka_msf(g, _cfg(), weights=wdf)

    def q_coloring(spark, sf_dir):
        from planar_spark.kernels.coloring import greedy_coloring

        return greedy_coloring(_graph8(spark, sf_dir), _cfg())

    def q_kcore(spark, sf_dir):
        from planar_spark.kernels.kcore import k_core

        return k_core(_graph(spark, sf_dir), k=KCORE_K, config=_cfg())

    def q_multimodal_decode(spark, sf_dir):
        """Multimodal dataflow over the documents table: opaque binary
        payload (utf-8 text bytes stand in for image bytes) decoded by
        the Arrow-batched mapInPandas operator; the deterministic fake
        decode (md5-byte features) is itself oracle-checked."""
        from planar_spark.ingest.multimodal import extract_media_features

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        media = docs.select(
            F.col("doc_id").cast("string").alias("url"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        feats = extract_media_features(media, fake=True)
        return feats.select(
            F.col("url").cast("long").alias("doc_id"),
            F.posexplode("feature").alias("pos", "val"),
        ).select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.col("val").cast("double").alias("val"),
        )

    def q_stream_edges(spark, sf_dir):
        """Streaming ingestion under the hard-oracle regime: synthesize
        a deterministic pages table from the documents (each page links
        to two hash-derived doc urls), deliver it in TWO batches through
        the exactly-once Structured Streaming edge-ingestion path
        (Trigger.AvailableNow + checkpoint + file-sink commit log), AND
        (r5) through the watermarked update-mode window aggregation.
        Batch 2's odd doc_ids interleave batch 1's even ones in event
        time, so nearly all of batch 2 arrives LATE (behind the max
        event time the checkpointed watermark tracks, within the 4h
        delay) — the window counts the gate returns are only correct
        if late data re-emits corrected windows. Failure modes caught
        by the value hash: broken exactly-once -> even-doc edges appear
        twice; dropped/uncorrected late data -> window counts reflect
        only even docs while the batch-SQL oracle counts all."""
        import tempfile

        from planar_spark.streaming.ingest_stream import (
            run_edge_ingestion,
            run_windowed_counts,
            windowed_counts_latest,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        url = lambda c: F.concat(  # noqa: E731
            F.lit("https://ex.org/doc/"), c.cast("long").cast("string")
        )

        def pages(parity: int):
            html = F.concat(
                F.lit("<html><title>d"),
                F.col("doc_id").cast("string"),
                F.lit('</title><p>body</p><a href="'),
                url((F.col("doc_id") * 7 + 1) % 499),
                F.lit('">x</a><a href="'),
                url((F.col("doc_id") * 13 + 2) % 499),
                F.lit('">y</a></html>'),
            )
            return docs.where(F.col("doc_id") % 2 == parity).select(
                url(F.col("doc_id")).alias("url"),
                F.timestamp_seconds(
                    F.lit(1700000000) + F.col("doc_id") * STREAM_TS_STEP
                ).alias("warc_ts"),
                F.encode(html, "UTF-8").alias("html"),
                F.lit("").alias("text"),
                F.lit("en").alias("lang"),
            )

        base = tempfile.mkdtemp(prefix="planar_stream_gate_")
        in_dir, out_dir, ckpt, wout, wckpt = (
            f"{base}/pages", f"{base}/edges", f"{base}/ckpt",
            f"{base}/wins", f"{base}/wckpt",
        )
        pages(0).write.mode("append").parquet(in_dir)
        run_edge_ingestion(spark, in_dir, out_dir, ckpt)
        run_windowed_counts(spark, in_dir, wout, wckpt)
        pages(1).write.mode("append").parquet(in_dir)
        run_edge_ingestion(spark, in_dir, out_dir, ckpt)
        run_windowed_counts(spark, in_dir, wout, wckpt)
        edges = spark.read.parquet(out_dir).select(
            F.lit("edge").alias("kind"),
            F.col("src_url").alias("k"),
            F.col("dst_url").alias("v"),
        )
        wins = windowed_counts_latest(spark, wout).select(
            F.lit("window").alias("kind"),
            F.col("window_start").cast("string").alias("k"),
            F.col("n_pages").cast("string").alias("v"),
        )
        return edges.unionAll(wins)

    def q_gnn_forward(spark, sf_dir):
        from planar_spark.kernels.gnn import gnn_forward

        g = _graph8(spark, sf_dir)
        dim = 8
        feats = g.vertices.select(
            "vid",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: ((F.col("vid") * 31 + i) % 97).cast("double") / 97.0,
            ).alias("vec"),
        )
        out = gnn_forward(g, feats, num_layers=GNN_LAYERS, dim=dim, config=_cfg())
        # Exploded scalar rows (vid, pos, val) so the driver's value
        # hasher sees sortable scalars, never raw array columns.
        return out.select("vid", F.posexplode("vec").alias("pos", "val")).select(
            "vid",
            F.col("pos").cast("long").alias("pos"),
            F.round("val", 6).alias("val"),
        )

    # EXACTLY 50 gates — the driver's per-round check budget (measured
    # r4: 50 of 58 registered gates were checked, silently dropping the
    # dict tail). Curated r5 by consolidation, not deletion:
    #   simhash + winnow_fingerprints      -> fingerprints (kind column)
    #   detect_language + lang_stats       -> lang_stats (group by pred)
    #   one_hop_min + two_hop_stats        -> two_hop_stats (vid join)
    #   degree_histogram/reciprocity/
    #     powerlaw_alpha/assortativity     -> graph_profile (stat melt)
    #   triangle_count/triangle_per_vertex -> local_clustering (carries
    #                                         per-vertex triangles)
    #   ngram_jaccard                      -> dropped as a standalone
    #     key: dedup_near_clusters's oracle value-hashes the LSH ->
    #     jaccard rerank end-to-end; kernel pytest remains.
    # r6: out_degrees                      -> two_hop_stats (full-vertex
    #     left join carries out_deg), freeing one slot for the new
    #     decomposition_profile gate (core/truss numbers + densest).
    # §2-canonical kernels lead so they can never rotate out.
    return {
        "pagerank": q_pagerank,
        "wcc": q_wcc,
        "wcc_boruvka": q_wcc_boruvka,
        "lpa": q_lpa,
        "sssp": q_sssp,
        "msf": q_msf,
        "msf_weighted": q_msf_weighted,
        "coloring": q_coloring,
        "kcore": q_kcore,
        "ktruss": q_ktruss,
        "scc": q_scc,
        "gnn_forward": q_gnn_forward,
        "stream_edges": q_stream_edges,
        "hits": q_hits,
        "ppr": q_ppr,
        "wcc_incremental": q_wcc_incremental,
        "bowtie": q_bowtie,
        "sssp_weighted": q_sssp_weighted,
        "pagerank_warmstart": q_pagerank_warmstart,
        "pagerank_locality": q_pagerank_locality,
        "neighborhood_function": q_neighborhood_function,
        "distance_histogram": q_distance_histogram,
        "effective_diameter": q_effective_diameter,
        "triad_census": q_triad_census,
        "centrality_profile": q_centrality_profile,
        "local_clustering": q_local_clustering,
        "louvain": q_louvain,
        "graph_profile": q_graph_profile,
        "decomposition_profile": q_decomposition_profile,
        "two_hop_stats": q_two_hop_stats,
        "khop_risk": q_khop_risk,
        "random_walk": q_random_walk,
        "node2vec_walk": q_node2vec_walk,
        "dict_encode": q_dict_encode,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "lang_stats": q_lang_stats,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "embedding_topk": q_embedding_topk,
        "embedding_ann_topk": q_embedding_ann_topk,
        "multimodal_decode": q_multimodal_decode,
        "quality_score": q_quality_score,
        "repetition_stats": q_repetition_stats,
        "doc_sample": q_doc_sample,
        "top_ngrams": q_top_ngrams,
        "url_normalize": q_url_normalize,
        "host_graph": q_host_graph,
        "host_pagerank": q_host_pagerank,
        "corpus_ngram_dedup": q_corpus_ngram_dedup,
        "dedup_near_clusters": q_dedup_near_clusters,
        "fingerprints": q_fingerprints,
    }


def oracle_sql() -> dict[str, str]:
    tri_base = f"WITH {_EDGES},\n{_UND},\n" + (
        "t AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1"
        " JOIN u e2 ON e1.b = e2.a"
        " JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)"
    )
    return {
        "pagerank": _pagerank_sql(),
        "ppr": _ppr_sql(),
        "hits": _hits_sql(),
        "gnn_forward": _gnn_sql(),
        # batch derivation of the stream-produced table: page of doc d
        # links to docs (7d+1)%499 and (13d+2)%499 (see q_stream_edges)
        # — UNION ALL keeps the rare hash-collision duplicate pair,
        # exactly like the two exploded hrefs — plus (r5) the
        # late-corrected 10-minute window counts over event time
        # 1700000000 + 13*doc_id, counting ALL docs per window (the
        # stream side only matches if late batch-2 rows corrected the
        # already-emitted windows)
        "stream_edges": f"""WITH d AS (SELECT doc_id FROM documents)
SELECT 'edge' AS kind,
       'https://ex.org/doc/' || CAST(doc_id AS VARCHAR) AS k,
       'https://ex.org/doc/' || CAST((doc_id * 7 + 1) % 499 AS VARCHAR)
       AS v
FROM d
UNION ALL
SELECT 'edge', 'https://ex.org/doc/' || CAST(doc_id AS VARCHAR),
       'https://ex.org/doc/' || CAST((doc_id * 13 + 2) % 499 AS VARCHAR)
FROM d
UNION ALL
SELECT 'window',
       CAST((1700000000 + doc_id * {STREAM_TS_STEP}) // 600 * 600
            AS VARCHAR),
       CAST(COUNT(*) AS VARCHAR)
FROM d
GROUP BY (1700000000 + doc_id * {STREAM_TS_STEP}) // 600 * 600""",
        "coloring": _coloring_sql(),
        "msf": _msf_sql(),
        "msf_weighted": _msf_sql(weighted=True),
        "kcore": _kcore_sql(),
        "embedding_ann_topk": _ann_sql(),
        "quality_score": _quality_sql(),
        "repetition_stats": _repetition_sql(),
        "host_graph": _host_graph_sql(),
        "host_pagerank": _host_pagerank_sql(),
        # bucket = first 8 md5 hex chars of 's0'||doc_id mod 100 —
        # identical integer in DuckDB (see textops.sample_documents)
        "doc_sample": """SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5('s0' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25
                  WHEN 'fr' THEN 10 ELSE 5 END""",
        "top_ngrams": r"""WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g3 AS MATERIALIZED (
    SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
    FROM toks, UNNEST(generate_series(1, LEN(t) - 2)) AS u(i)
    WHERE LEN(t) >= 3
)
SELECT gram, COUNT(*) AS cnt FROM g3 GROUP BY gram
ORDER BY cnt DESC, gram ASC LIMIT 20""",
        "url_normalize": """WITH messy AS (
    SELECT doc_id,
           'HTTPS://WWW.' || upper(source) || '.Example/Doc/'
           || CAST(doc_id AS VARCHAR) || '/?utm_source=x#frag' AS url
    FROM documents
)
SELECT doc_id,
       replace(lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1)),
               '://www.', '://')
       || regexp_replace(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS url_norm
FROM messy""",
        "corpus_ngram_dedup": _corpus_dedup_sql(5),
        "dedup_near_clusters": _near_dup_sql(),
        "multimodal_decode": """WITH pos AS (
    SELECT UNNEST(generate_series(0, 15)) AS p
)
SELECT d.doc_id, CAST(pos.p AS BIGINT) AS pos,
       CAST(('0x' || substr(md5(d.text), 2 * pos.p + 1, 2)) AS INTEGER)
       / 256.0 AS val
FROM documents d CROSS JOIN pos""",
        "wcc": _wcc_sql(),
        "wcc_boruvka": _wcc_sql(),
        "wcc_incremental": _wcc_sql(),
        "scc": _scc_sql(),
        "bowtie": _bowtie_sql(),
        "neighborhood_function": _nf_sql(),
        "distance_histogram": _dist_hist_sql(),
        "effective_diameter": _eff_diam_sql(),
        "triad_census": _triad_sql(),
        "centrality_profile": _centrality_profile_sql(),
        "ktruss": _ktruss_sql(),
        "sssp_weighted": _wsssp_sql(),
        # warm-start = exact step-continuation, so the converged result
        # is the same 5-iteration fixpoint as the cold gate
        "pagerank_warmstart": _pagerank_sql(),
        "pagerank_locality": _pagerank_sql(),
        "lpa": _lpa_sql(),
        "local_clustering": tri_base
        + """
, corners AS (SELECT x AS vid FROM t UNION ALL SELECT y FROM t
              UNION ALL SELECT z FROM t)
, tc AS (SELECT v.vid, COALESCE(c.n, CAST(0 AS BIGINT)) AS triangles
         FROM verts v LEFT JOIN
         (SELECT vid, COUNT(*) AS n FROM corners GROUP BY vid) c
         ON v.vid = c.vid)
, ud AS (SELECT vid, COUNT(*) AS udeg FROM
         (SELECT a AS vid FROM u UNION ALL SELECT b FROM u) GROUP BY vid)
SELECT t.vid, t.triangles, COALESCE(ud.udeg, CAST(0 AS BIGINT)) AS udeg,
       CASE WHEN COALESCE(ud.udeg, 0) >= 2
            THEN ROUND(t.triangles * 2.0 / (ud.udeg * (ud.udeg - 1)), 6)
            ELSE 0.0 END AS lcc
FROM tc t LEFT JOIN ud ON t.vid = ud.vid""",
        "louvain": _louvain_sql(),
        "decomposition_profile": _decomposition_profile_sql(),
        # consolidated r5: the four graphstats kernels melted to
        # (stat, key, value), one hard gate — the run_kernel `stats`
        # kernel shape. Each leg is the former standalone oracle as a
        # CTE-in-subquery (DuckDB supports WITH in derived tables).
        "graph_profile": f"""SELECT 'degree_histogram' AS stat,
       CAST(bucket AS VARCHAR) AS key, CAST(n_vertices AS DOUBLE) AS value
FROM (WITH {_EDGES},
deg AS MATERIALIZED (
    SELECT v.vid, COALESCE(g.outdeg, CAST(0 AS BIGINT)) AS out_deg
    FROM verts v LEFT JOIN
    (SELECT src AS vid, COUNT(*) AS outdeg FROM edges GROUP BY src) g
    ON v.vid = g.vid
)
SELECT CAST(LENGTH(bin(out_deg + 1)) - 1 AS BIGINT) AS bucket,
       COUNT(*) AS n_vertices
FROM deg GROUP BY bucket)
UNION ALL
SELECT 'reciprocity', k, v
FROM (WITH {_EDGES},
r AS MATERIALIZED (
    SELECT COUNT(*) AS n FROM edges e
    WHERE EXISTS (SELECT 1 FROM edges x
                  WHERE x.src = e.dst AND x.dst = e.src)
),
t AS MATERIALIZED (SELECT COUNT(*) AS n FROM edges)
SELECT u.k, u.v FROM t CROSS JOIN r CROSS JOIN LATERAL (
    SELECT 'n_edges' AS k, CAST(t.n AS DOUBLE) AS v
    UNION ALL SELECT 'n_reciprocal', CAST(r.n AS DOUBLE)
    UNION ALL SELECT 'ratio', ROUND(CAST(r.n AS DOUBLE) / t.n, 6)
) u)
UNION ALL
SELECT 'powerlaw', k, v
FROM (WITH {_EDGES},
deg AS MATERIALIZED (
    SELECT src AS vid, COUNT(*) AS out_deg FROM edges GROUP BY src
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
             ROUND(1.0 + COUNT(*) / SUM(LN(out_deg / 1.5)), 6) AS alpha
      FROM deg WHERE out_deg >= 2)
SELECT u.k, u.v FROM s CROSS JOIN LATERAL (
    SELECT 'n_tail' AS k, CAST(s.n_tail AS DOUBLE) AS v
    UNION ALL SELECT 'alpha', CAST(s.alpha AS DOUBLE)
) u)
UNION ALL
SELECT 'assortativity', k, v
FROM (WITH a0 AS ({_assortativity_sql()})
SELECT u.k, u.v FROM a0 CROSS JOIN LATERAL (
    SELECT 'n_ends' AS k, CAST(a0.n_ends AS DOUBLE) AS v
    UNION ALL SELECT 'pearson_r', CAST(a0.assortativity AS DOUBLE)
) u)
UNION ALL
SELECT 'edge_sample', CAST(src AS VARCHAR), CAST(dst AS DOUBLE)
FROM (WITH {_EDGES}
SELECT src, dst FROM edges
WHERE CAST(('0x' || substr(md5('e0' || CAST(src AS VARCHAR) || '_'
            || CAST(dst AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20)""",
        # consolidated r5: one-hop WriteMin joined into the two-hop
        # gate; r6: out-degrees fold in too (full-vertex, -1/-0 fills)
        "two_hop_stats": f"""WITH {_EDGES},
mid_stats AS MATERIALIZED (
    SELECT src AS mid, MIN(dst) AS mn, MAX(dst) AS mx FROM edges GROUP BY src
),
th AS MATERIALIZED (
    SELECT e1.src AS vid, MIN(m.mn) AS min_two_hop, MAX(m.mx) AS max_two_hop
    FROM edges e1 JOIN mid_stats m ON e1.dst = m.mid GROUP BY e1.src
),
oh AS MATERIALIZED (
    SELECT src AS vid, MIN(dst) AS min_nbr FROM edges GROUP BY src
),
dg AS MATERIALIZED (
    SELECT src AS vid, COUNT(*) AS outdeg FROM edges GROUP BY src
)
SELECT v.vid,
       COALESCE(th.min_two_hop, -1) AS min_two_hop,
       COALESCE(th.max_two_hop, -1) AS max_two_hop,
       COALESCE(oh.min_nbr, -1) AS min_nbr,
       COALESCE(dg.outdeg, CAST(0 AS BIGINT)) AS out_deg
FROM verts v
LEFT JOIN th ON v.vid = th.vid
LEFT JOIN oh ON v.vid = oh.vid
LEFT JOIN dg ON v.vid = dg.vid""",
        "sssp": _sssp_sql(),
        "khop_risk": f"""WITH {_EDGES},
sv AS (SELECT vid, CASE WHEN vid % 17 = 0 THEN 1 ELSE 0 END AS seed FROM verts),
c1 AS (SELECT e.src AS vid, SUM(s.seed) AS risk1 FROM edges e
       JOIN sv s ON e.dst = s.vid GROUP BY e.src),
b AS (SELECT sv.vid, sv.seed, COALESCE(c1.risk1, 0) AS risk1
      FROM sv LEFT JOIN c1 ON sv.vid = c1.vid),
nr AS (SELECT e.src AS vid, SUM(b2.risk1) AS nbr_risk FROM edges e
       JOIN b b2 ON e.dst = b2.vid GROUP BY e.src)
SELECT b.vid, CAST(CASE WHEN b.seed = 1
        OR (b.seed + COALESCE(nr.nbr_risk, 0)) > 4
        THEN 1 ELSE 0 END AS BIGINT) AS risky
FROM b LEFT JOIN nr ON b.vid = nr.vid""",
        "random_walk": _random_walk_sql(),
        "node2vec_walk": _node2vec_sql(),
        "dict_encode": """WITH urls AS (
  SELECT DISTINCT 'https://' || source || '.example/doc/'
         || CAST(doc_id AS VARCHAR) AS url FROM documents
)
SELECT url, CAST(DENSE_RANK() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
FROM urls""",
        "dedup_exact": """SELECT MD5(text) AS text_hash,
       MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY MD5(text)""",
        "token_stats": r"""SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS BIGINT) AS n_wordpieces
FROM documents""",
        # consolidated r5: grouped by the DETECTED language — one gate
        # value-hashes the stopword language-ID kernel + the corpus agg
        "lang_stats": f"""SELECT p.pred_lang, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM ({_langid_sql()}) p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY p.pred_lang""",
        "minhash_lsh_pairs": _MINHASH_CTES
        + """
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM buckets l JOIN buckets r ON l.band = r.band AND l.bkey = r.bkey
WHERE l.doc_id < r.doc_id""",
        # simhash + winnowing (MOSS) fingerprints, consolidated r5
        # under ONE `fingerprints` gate: each leg is the former
        # standalone oracle as a CTE-in-subquery, unioned with a kind
        # column matching the Spark side. Winnow: per-window min of
        # k-gram int60 hashes, window starts clamped exactly like
        # kernels/textops.py.
        "fingerprints": "SELECT doc_id, 'simhash' AS kind, simhash AS fp"
        " FROM (" + r"""WITH toks AS MATERIALIZED (
    SELECT doc_id,
           UNNEST(list_distinct(regexp_extract_all(text, '\S+'))) AS tok
    FROM documents
),
th AS MATERIALIZED (
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
    FROM toks
),
votes AS MATERIALIZED (
    SELECT doc_id, u.j, SUM(2 * ((h >> u.j) & 1) - 1) AS s
    FROM th, UNNEST(generate_series(0, 31)) AS u(j)
    GROUP BY doc_id, u.j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id"""
        + ")\nUNION ALL\nSELECT doc_id, 'winnow', fp FROM ("
        + r"""WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS tokens FROM documents
),
g AS MATERIALIZED (
    SELECT doc_id, u.i - 1 AS pos,
           array_to_string(tokens[u.i:u.i+4], ' ') AS gram,
           len(tokens) - 4 AS n
    FROM toks, UNNEST(generate_series(1, len(tokens) - 4)) AS u(i)
    WHERE len(tokens) >= 5
    UNION ALL
    SELECT doc_id, 0, array_to_string(tokens, ' '), 1
    FROM toks WHERE len(tokens) < 5
),
h AS MATERIALIZED (
    SELECT doc_id, pos, n,
           CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
    FROM g
),
rep AS MATERIALIZED (
    SELECT doc_id, u.w, h
    FROM h, UNNEST(generate_series(GREATEST(pos - 3, 0),
                                   LEAST(pos, GREATEST(n - 4, 0)))) AS u(w)
),
sel AS MATERIALIZED (
    SELECT doc_id, w, MIN(h) AS fp FROM rep GROUP BY doc_id, w
)
SELECT DISTINCT doc_id, fp FROM sel""" + ")",
        "embedding_topk": r"""WITH nrm AS MATERIALIZED (
    SELECT vec_id, embedding,
           SQRT(list_aggregate(list_transform(list_zip(embedding, embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'))
           AS nrm
    FROM embeddings
),
sims AS MATERIALIZED (
    SELECT q.vec_id AS q, n.vec_id AS neighbor,
           ROUND(list_aggregate(list_transform(list_zip(q.embedding, n.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                 / (q.nrm * n.nrm), 4) AS sim
    FROM nrm q CROSS JOIN nrm n
    WHERE q.vec_id % 100 = 0 AND q.vec_id <> n.vec_id
)
SELECT q, neighbor, sim FROM (
    SELECT q, neighbor, sim,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, neighbor ASC) AS rn
    FROM sims
) WHERE rn <= 5""",
    }
