"""DuckDB oracle SQL for the driver's correctness gate.

Every SQL-expressible query in ``__spark_entry__.queries()`` gets an ANSI-SQL
twin here. Numeric stabilization mirrors the Spark side exactly: DECIMAL
accumulation for sums (order-independent), explicit rounding for ratios.

The Vietnamese normalization chain is *generated* from the same rule tables
the engine executes (``functions/vnnorm``), so the oracle can never drift
from the implementation. One reference rule (the ``br`` branch-prefix rule)
uses a lookahead RE2 does not support; it is omitted here and pytest asserts
it is a no-op on the oracle's input data (ASCII part names).
"""

from __future__ import annotations

from company_name_matching_spark.functions.vnnorm import (
    ACCENT_DST,
    ACCENT_SRC,
    ENTITY_RULES,
    FUNCTIONAL_RULES,
    SPECIAL_CHAR_PATTERN,
    STOPWORDS,
    STOPWORDS_NO_ACCENT,
)


from company_name_matching_spark.functions import pii as _pii

# DuckDB twins of the PII redaction chain, generated from the SAME
# pattern table the engine executes (functions/pii.PII_PATTERNS) so the
# oracle can never drift from the implementation.
_pii_redact_sql = _pii.oracle_redact_sql("contact")
_pii_count_sqls = [
    _pii.oracle_count_sql("contact", name) for name, _p, _t in _pii.PII_PATTERNS
]

from company_name_matching_spark.operators.sampling import (  # noqa: E402
    _hex_threshold,
)

# generated from the SAME threshold function the engine filters with
_sample_threshold = _hex_threshold(0.1)
# split cuts: the SAME cumulative sums split_assign computes internally
# (0.8, then 0.8 + 0.1 — the float expression order matters for the
# literal to match byte-for-byte)
_split_cut_train = _hex_threshold(0.8)
_split_cut_val = _hex_threshold(0.8 + 0.1)


def _pagerank_sql(iterations: int = 3) -> str:
    """The fixed-unrolling PageRank twin: r0..rN as chained CTEs, same
    decimal-accumulated 12dp-rounded arithmetic as graph.pagerank (all
    double ops written with explicit DOUBLE casts so DuckDB cannot
    quietly use DECIMAL literals and diverge from IEEE)."""
    d = "CAST(0.85 AS DOUBLE)"
    ctes = [
        """e AS (
            SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                            's' || CAST(l.l_suppkey AS VARCHAR) AS dst
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )""",
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        "deg AS (SELECT src, COUNT(*) AS outd FROM e GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        """r0 AS (
            SELECT id, round(CAST(1.0 AS DOUBLE) / nn.n, 12) AS rank
            FROM nodes, nn
        )""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"""r{i} AS (
            SELECT n.id,
                   round((CAST(1.0 AS DOUBLE) - {d}) / nn.n
                         + {d} * CAST(COALESCE(s._in, 0) AS DOUBLE),
                         12) AS rank
            FROM nodes n CROSS JOIN nn
            LEFT JOIN (
                SELECT e.dst,
                       SUM(CAST(round(r.rank / dg.outd, 12)
                                AS DECIMAL(38,12))) AS _in
                FROM e JOIN r{i - 1} r ON e.src = r.id
                       JOIN deg dg ON e.src = dg.src
                GROUP BY e.dst
            ) s ON n.id = s.dst
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, rank FROM r{iterations} ORDER BY id"
    )


def _fuzzy_parts_cc_ctes() -> str:
    """Shared CTE chain of the full fuzzy-ER replay over part names
    (normalize → pair decisions → recursive transitive closure), ending in
    ``cc(p_partkey, cluster_rep)``. Used by er_cluster_fuzzy_parts and the
    golden-record survivorship twin so the two oracles can never drift on
    the clustering they audit."""
    return f"""n AS (
                SELECT p_partkey, {clean_name_sql('p_name')} AS mk
                FROM part
                WHERE trim(p_name) != ''
                  AND length(p_name) BETWEEN 3 AND 200
                  AND NOT regexp_matches(p_name, '^[^a-zA-Z0-9À-ɏḀ-ỿ]+$')
            ),
            t AS (
                SELECT p_partkey, mk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS toks
                FROM n WHERE mk != ''
            ),
            pairs AS (
                SELECT l.p_partkey AS a, r.p_partkey AS b
                FROM t l JOIN t r ON l.p_partkey < r.p_partkey
                WHERE l.mk = r.mk
                   OR 0.6 * (CAST(len(l.toks) + len(r.toks)
                                  - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                             / len(list_distinct(l.toks || r.toks)))
                    + 0.4 * (1.0 - CAST(levenshtein(l.mk, r.mk) AS DOUBLE)
                             / greatest(length(l.mk), length(r.mk))) >= 0.86
            ),
            edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION
                SELECT b AS src, a AS dst FROM pairs
            ),
            reach(node, lab) AS (
                SELECT p_partkey, p_partkey FROM t
                UNION
                SELECT e.dst AS node, r.lab
                FROM reach r JOIN edges e ON e.src = r.node
            ),
            cc AS (
                SELECT node AS p_partkey, MIN(lab) AS cluster_rep
                FROM reach GROUP BY node
            )"""


def _pivot_docs_ctes(rounds: int = 8) -> list:
    """Chained-CTE twin of ``clustering.pivot_clusters`` over the
    jaccard ≥ 0.8 document edges (same pair SQL as docs_jaccard_neardup),
    through the final ``lab(node, cluster_id)`` labeling CTE.

    rank(node) = md5(cast(id as varchar)) — both engines compute it
    natively. Round k on the active-induced symmetric edge set ``e{{k}}``:
    ``piv{{k}}`` = active local-minima (or isolated), ``asg{{k}}`` = pivots
    to themselves plus members to their arg_min-rank adjacent pivot,
    ``a{{k+1}}``/``e{{k+1}}`` = survivors. Rounds past the drain point are
    no-ops, so ``rounds`` is an UPPER bound — and the engine RAISES if it
    cannot drain within its own bound, so a shortfall can never silently
    pass the gate. Docs with no edges label themselves (attach_singletons
    twin)."""
    ctes = [
        r"""t AS MATERIALIZED (
            SELECT doc_id, lang,
                   list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
            FROM documents
        )""",
        """prs AS MATERIALIZED (
            SELECT l.doc_id AS a, r.doc_id AS b
            FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
            WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                  / len(list_distinct(l.toks || r.toks)) >= 0.8
        )""",
        """e0 AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM prs
            UNION
            SELECT b AS src, a AS dst FROM prs
        )""",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0)",
    ]
    for k in range(rounds):
        ctes.append(f"""nb{k} AS MATERIALIZED (
            SELECT src AS node, MIN(md5(CAST(dst AS VARCHAR))) AS mn
            FROM e{k} GROUP BY src
        )""")
        ctes.append(f"""piv{k} AS MATERIALIZED (
            SELECT a.node FROM a{k} a LEFT JOIN nb{k} n ON n.node = a.node
            WHERE n.mn IS NULL OR md5(CAST(a.node AS VARCHAR)) < n.mn
        )""")
        ctes.append(f"""asg{k} AS MATERIALIZED (
            SELECT node, node AS cluster_id FROM piv{k}
            UNION ALL
            SELECT e.src AS node,
                   arg_min(e.dst, md5(CAST(e.dst AS VARCHAR))) AS cluster_id
            FROM e{k} e JOIN piv{k} p ON p.node = e.dst
            GROUP BY e.src
        )""")
        ctes.append(f"""a{k + 1} AS MATERIALIZED (
            SELECT a.node FROM a{k} a LEFT JOIN asg{k} s ON s.node = a.node
            WHERE s.cluster_id IS NULL
        )""")
        ctes.append(f"""e{k + 1} AS MATERIALIZED (
            SELECT e.src, e.dst FROM e{k} e
            JOIN a{k + 1} s ON s.node = e.src
            JOIN a{k + 1} d ON d.node = e.dst
        )""")
    asg_union = "\n            UNION ALL ".join(
        f"SELECT node, cluster_id FROM asg{k}" for k in range(rounds)
    )
    ctes.append(f"""lab AS MATERIALIZED (
        {asg_union}
        UNION ALL
        SELECT d.doc_id AS node, d.doc_id AS cluster_id
        FROM documents d LEFT JOIN a0 ON a0.node = d.doc_id
        WHERE a0.node IS NULL
    )""")
    return ctes


def _pivot_docs_sql(rounds: int = 8) -> str:
    """See :func:`_pivot_docs_ctes`; final projection adds cluster sizes."""
    ctes = _pivot_docs_ctes(rounds) + [
        """sz AS MATERIALIZED (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
    )"""
    ]
    return (
        "WITH " + ",\n        ".join(ctes)
        + """
        SELECT l.node AS doc_id, l.cluster_id, s.cluster_size
        FROM lab l JOIN sz s USING (cluster_id)
        ORDER BY doc_id"""
    )


def _cc_objective_sql(rounds: int = 8) -> str:
    """Correlation-clustering disagreements of BOTH labelings (recursive
    transitive closure and the chained pivot rounds) over the shared
    jaccard ≥ 0.8 edge CTEs — the twin of
    ``clustering.correlation_objective`` run on each method's labels.
    disagreements = (E − intra) + (Σ C(n_c,2) − intra), all exact
    integers."""
    ctes = _pivot_docs_ctes(rounds)
    ctes.append("""reach(node, labl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst AS node, r.labl
        FROM reach r JOIN e0 e ON e.src = r.node
    )""")
    ctes.append("""ccm AS MATERIALIZED (
        SELECT node AS doc_id, MIN(labl) AS cluster_id FROM reach GROUP BY node
    )""")

    def obj(tag, labcte, idcol):
        return f"""(
            SELECT '{tag}' AS method,
                   c.nc AS n_clusters, e.ne AS n_edges,
                   i.ni AS n_intra_edges,
                   CAST((e.ne - i.ni) + (s.cp - i.ni) AS BIGINT)
                     AS n_disagreements
            FROM (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS nc
                  FROM {labcte}) c,
                 (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM prs) e,
                 (SELECT CAST(COUNT(*) AS BIGINT) AS ni
                  FROM prs p
                  JOIN {labcte} x ON x.{idcol} = p.a
                  JOIN {labcte} y ON y.{idcol} = p.b
                  WHERE x.cluster_id = y.cluster_id) i,
                 (SELECT CAST(SUM(CAST(n * (n - 1) / 2 AS BIGINT)) AS BIGINT)
                    AS cp
                  FROM (SELECT COUNT(*) AS n FROM {labcte}
                        GROUP BY cluster_id) z) s
        )"""

    return (
        "WITH RECURSIVE " + ",\n        ".join(ctes)
        + f"""
        SELECT * FROM {obj('cc', 'ccm', 'doc_id')}
        UNION ALL
        SELECT * FROM {obj('pivot', 'lab', 'node')}
        ORDER BY method"""
    )


from company_name_matching_spark.operators.problink import (  # noqa: E402
    FIELDS as _FS_FIELDS,
    FSConfig as _FSConfig,
)

# generated from the SAME m/u table + literal-weight renderer the engine's
# fs_score_pairs embeds in its plan, so the oracle can never drift
_fs_weights = _FSConfig().weights()


def _fs_weight_sql() -> str:
    terms = []
    for f_ in _FS_FIELDS:
        cases = " ".join(
            f"WHEN {lvl} THEN CAST('{lit}' AS DECIMAL(18,6))"
            for lvl, lit in sorted(_fs_weights[f_].items())
        )
        terms.append(f"(CASE {f_} {cases} END)")
    return " + ".join(terms)


def _me_sql(lt: str, rt: str) -> str:
    """Directed Monge–Elkan over two token-list columns — the exact twin of
    ``scoring.monge_elkan_col``: per-token best inner sim
    (1 − lev/max-len), 6dp-rounded, exact micro-unit longs summed
    order-independently, final mean divided in doubles in the same op
    order (÷1e6 then ÷len)."""
    inner = ("1.0 - CAST(levenshtein(a, b) AS DOUBLE)"
             " / greatest(length(a), length(b))")
    per = f"list_max(list_transform({rt}, b -> {inner}))"
    units = (f"list_transform({lt}, a -> "
             f"CAST(round(round({per}, 6) * 1000000.0, 0) AS BIGINT))")
    return (f"round(CAST(list_aggregate({units}, 'sum') AS DOUBLE)"
            f" / 1000000.0 / len({lt}), 6)")


def _stf_dir_sql(lt: str, rt: str) -> str:
    """Directed Soft-TF-IDF nano-unit sum over struct-lists (t, w) — the
    exact twin of scoring.soft_tfidf_pairs.directed_units. SQL lambdas
    have no let-binding, so SIMS/BEST inline repeatedly (in-row cost
    only; the oracle runs at sf scale)."""
    sims = ("list_transform({rt}, b -> struct_pack("
            "s := round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)"
            " / greatest(length(a.t), length(b.t)), 9), w := b.w))"
            ).format(rt=rt)
    best = f"list_max(list_transform({sims}, y -> y.s))"
    maxw = (f"list_max(list_transform(list_filter({sims}, "
            f"x -> x.s = {best}), z -> z.w))")
    per_a = (f"CASE WHEN {best} > 0.9 THEN "
             f"CAST(round(round(a.w * {maxw} * {best}, 9)"
             f" * 1000000000.0, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    return f"list_aggregate(list_transform({lt}, a -> {per_a}), 'sum')"


def _fs_levels_ctes() -> str:
    """Shared CTE chain for the Fellegi–Sunter oracles: part names →
    first-sorted-token blocked pairs → integer-decided agreement levels
    (the exact twin of __spark_entry__._fs_blocked_pair_levels)."""
    return f"""t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk, mk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            pr0 AS (
                SELECT l.pk AS pk_l, r.pk AS pk_r,
                       l.mk AS lmk, r.mk AS rmk, l.dt AS ldt, r.dt AS rdt,
                       len(l.dt) + len(r.dt)
                         - len(list_distinct(l.dt || r.dt)) AS i,
                       len(list_distinct(l.dt || r.dt)) AS u
                FROM f l JOIN f r
                  ON list_sort(l.dt)[1] = list_sort(r.dt)[1] AND l.pk < r.pk
            ),
            pr AS (
                SELECT pk_l, pk_r,
                       CAST(lmk = rmk AS INT) AS key_exact,
                       CAST(CASE WHEN 5 * i >= 4 * u THEN 2
                                 WHEN 2 * i >= u THEN 1
                                 ELSE 0 END AS INT) AS jaccard_band,
                       CAST(list_sort(ldt)[1] = list_sort(rdt)[1] AS INT)
                         AS first_token,
                       CAST(abs(length(lmk) - length(rmk)) <= 2 AS INT)
                         AS len_band
                FROM pr0
            )"""


def _metablock_ctes() -> str:
    """Shared CTE chain for the meta-blocking oracles: two-channel block
    keys → quadratic CBS pair weights → WNP-kept pairs ``kept(a, b, w)``
    (the exact twin of __spark_entry__._parts_two_channel_blocks +
    blocking.metablock_prune)."""
    return f"""t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk, mk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            keys AS (
                SELECT pk, 't:' || list_sort(dt)[1] AS bk FROM f
                UNION ALL
                SELECT pk, 'p4:' || substr(replace(mk, ' ', ''), 1, 4) FROM f
            ),
            pw AS (
                SELECT l.pk AS a, r.pk AS b, COUNT(*) AS w
                FROM keys l JOIN keys r ON l.bk = r.bk AND l.pk < r.pk
                GROUP BY l.pk, r.pk
            ),
            ns AS (
                SELECT id, SUM(w) AS s, COUNT(*) AS c
                FROM (SELECT a AS id, w FROM pw
                      UNION ALL SELECT b AS id, w FROM pw) e
                GROUP BY id
            ),
            kept AS (
                SELECT pw.a, pw.b, pw.w
                FROM pw JOIN ns na ON na.id = pw.a JOIN ns nb ON nb.id = pw.b
                WHERE pw.w * na.c >= na.s OR pw.w * nb.c >= nb.s
            )"""


def _fs_em_sql(iterations: int = 2, initial_lambda: float = 0.1) -> str:
    """The EM twin as chained CTEs (the PageRank pattern): per round, the
    E-step γ is the IDENTICAL fixed chain of double ops the engine runs
    (((λ·m₁)·m₂)·m₃)·m₄ with parameters joined from the previous round's
    table, the M-step the same 12dp-decimal-summed, in-engine-rounded
    ratios. mu0/λ0 are rendered from the SAME FSConfig the engine uses."""
    rows = ",\n                    ".join(
        f"('{f_}', {lvl}, CAST({m!r} AS DOUBLE), CAST({u!r} AS DOUBLE))"
        for f_ in _FS_FIELDS
        for lvl, (m, u) in sorted(_FSConfig().mu[f_].items())
    )
    ctes = [
        _fs_levels_ctes(),
        f"""mu0 AS (
                SELECT * FROM (VALUES
                    {rows}
                ) AS v(field, level, m, u)
            )""",
        f"lam0 AS (SELECT CAST({initial_lambda!r} AS DOUBLE) AS l)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        num = "((((lam.l * m1.m) * m2.m) * m3.m) * m4.m)"
        den_u = "(((((CAST(1.0 AS DOUBLE) - lam.l) * m1.u) * m2.u) * m3.u) * m4.u)"
        joins = "\n                ".join(
            f"JOIN mu{p} m{j + 1} ON m{j + 1}.field = '{f_}' "
            f"AND m{j + 1}.level = pr.{f_}"
            for j, f_ in enumerate(_FS_FIELDS)
        )
        ctes.append(f"""g{i} AS (
                SELECT pr.*, CAST(round({num} / ({num} + {den_u}), 12)
                             AS DECIMAL(14,12)) AS g
                FROM pr
                CROSS JOIN lam{p} lam
                {joins}
            )""")
        stack = "\n                    UNION ALL ".join(
            f"SELECT '{f_}' AS field, {f_} AS level, g FROM g{i}"
            for f_ in _FS_FIELDS
        )
        ctes.append(f"""s{i} AS (
                SELECT field, level, COUNT(*) AS cnt, SUM(g) AS sg
                FROM ({stack}) st GROUP BY field, level
            )""")
        ctes.append(f"t{i} AS (SELECT SUM(g) AS tg, COUNT(*) AS n FROM g{i})")
        ctes.append(f"""mu{i} AS (
                SELECT field, level,
                       round(CAST(sg AS DOUBLE) / CAST(t.tg AS DOUBLE), 12)
                         AS m,
                       round(CAST(cnt - sg AS DOUBLE)
                             / CAST(t.n - t.tg AS DOUBLE), 12) AS u
                FROM s{i} CROSS JOIN t{i} t
            )""")
        ctes.append(
            f"lam{i} AS (SELECT round(CAST(tg AS DOUBLE) / n, 12) AS l "
            f"FROM t{i})"
        )
    return (
        "WITH " + ",\n            ".join(ctes)
        + f"""
            SELECT m.field, CAST(m.level AS INT) AS level, m.m, m.u,
                   l.l AS lam
            FROM mu{iterations} m CROSS JOIN lam{iterations} l
            ORDER BY field, level"""
    )


def _rr(expr: str, pattern: str, repl: str) -> str:
    pattern = pattern.replace("'", "''")
    repl = repl.replace("'", "''")
    return f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"


def clean_name_sql(col: str) -> str:
    """Render the full clean_name pipeline as nested DuckDB SQL.

    RE2 limitation: the lookahead-based 'br ' rule is skipped (see module
    docstring); every other rule is rendered verbatim from the rule tables.
    """
    e = f"lower(trim({col}))"
    for pat, rep in ENTITY_RULES:
        e = _rr(e, pat, rep)
    for pat, rep in FUNCTIONAL_RULES:
        if "(?=" in pat:  # RE2 has no lookahead
            continue
        e = _rr(e, pat, rep)
    e = _rr(e, SPECIAL_CHAR_PATTERN, " ")
    for pat in STOPWORDS:
        e = _rr(e, pat, "")
    e = f"translate({e}, '{ACCENT_SRC}', '{ACCENT_DST}')"
    for pat in STOPWORDS_NO_ACCENT:
        e = _rr(e, pat, "")
    e = _rr(e, r"\s+", " ")
    return f"trim({e})"


_TOKENS = "regexp_split_to_array(trim({t}), '\\s+')"
_STOPWORD_LIST = "['the','a','an','and','or','of','to','in','is','on']"
_VI_CLASS = "[àáạảãâầấậẩẫăằắặẳẵèéẹẻẽêềếệểễìíịỉĩòóọỏõôồốộổỗơờớợởỡùúụủũưừứựửữỳýỵỷỹđ]"


def _fingerprint(t: str) -> str:
    return f"md5(lower(regexp_replace(trim({t}), '\\s+', ' ', 'g')))"


def build_oracles() -> dict[str, str]:
    toks = _TOKENS.format(t="text")
    toks_lower = _TOKENS.format(t="lower(text)")
    nospace = "length(regexp_replace(trim(text), '\\s+', '', 'g'))"
    punct = ("CASE WHEN length(text) > 0 THEN "
             "CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)"
             " / length(text) ELSE 0.0 END")
    swr = (f"CASE WHEN len({toks_lower}) > 0 THEN "
           f"CAST(len(list_filter({toks_lower}, x -> list_contains({_STOPWORD_LIST}, x))) AS DOUBLE)"
           f" / len({toks_lower}) ELSE 0.0 END")
    rep = (f"CASE WHEN len({toks}) > 0 THEN "
           f"CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks}) ELSE 0.0 END")
    len_ok = "CASE WHEN length(text) BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.5 END"

    cosine = ("round(list_cosine_similarity("
              "CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 6)")

    def lsh_buckets_cte(n_tables: int, n_planes: int, dim: int) -> str:
        """SQL twin of ann.md5_hyperplanes + ann._bucket_col: hyperplane
        components from md5 (top-8-byte UBIGINT / 2^64, mapped to [-1,1)),
        bucket = table-prefixed sign bits of the 6dp-rounded dot product.
        Parity with the Python/Spark side is exact (verified on all 500
        sf0.01 vectors): power-of-two division is lossless and both engines
        fold the dot sequentially in doubles."""
        return f"""
            planes AS (
                SELECT t, p,
                       list(2*(('0x' || substring(md5('lshv1:' || t || ':' ||
                            p || ':' || i), 1, 16))::UBIGINT
                            / 18446744073709551616.0) - 1 ORDER BY i) AS plane
                FROM generate_series(0, {n_tables - 1}) ts(t),
                     generate_series(0, {n_planes - 1}) ps(p),
                     generate_series(0, {dim - 1}) isr(i)
                GROUP BY t, p
            ), buckets AS (
                SELECT e.vec_id, pl.t,
                       't' || pl.t || ':' || string_agg(
                           CASE WHEN round(list_dot_product(
                                    CAST(e.embedding AS DOUBLE[]), pl.plane), 6) >= 0
                                THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS bucket
                FROM embeddings e CROSS JOIN planes pl
                GROUP BY e.vec_id, pl.t
            )"""

    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
                   COUNT(*) AS count_order,
                   ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q3_top_orders": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT r_name, n_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
            FROM region JOIN nation ON r_regionkey = n_regionkey
                        JOIN customer ON n_nationkey = c_nationkey
                        JOIN orders ON c_custkey = o_custkey
                        JOIN lineitem ON o_orderkey = l_orderkey
                        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_customer_per_nation": """
            WITH spend AS (
                SELECT c_custkey, c_name, c_nationkey,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_spend
                FROM customer JOIN orders ON c_custkey = o_custkey
                GROUP BY 1, 2, 3
            ), ranked AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                        ORDER BY total_spend DESC, c_custkey ASC) AS rn
                FROM spend
            )
            SELECT n_name, c_name, ROUND(total_spend, 2) AS total_spend
            FROM ranked JOIN nation ON c_nationkey = n_nationkey
            WHERE rn = 1 ORDER BY n_name
        """,
        "priority_rates": """
            SELECT o_orderpriority,
                   COUNT(*) AS n_orders,
                   -- DuckDB SUM(int) returns HUGEINT (→ float64 in pandas);
                   -- Spark returns BIGINT. Cast so the driver's type-sensitive
                   -- value hash sees the same int64 on both sides.
                   CAST(SUM(CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                   CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "orders_describe": """
            SELECT 'o_totalprice' AS column, COUNT(o_totalprice) AS n,
                   CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS max_val,
                   ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                         / COUNT(o_totalprice), 6) AS avg_val
            FROM orders
            UNION ALL
            SELECT 'o_orderkey', COUNT(o_orderkey),
                   CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE),
                   ROUND(CAST(SUM(CAST(o_orderkey AS DECIMAL(30,0))) AS DOUBLE)
                         / COUNT(o_orderkey), 6)
            FROM orders
            UNION ALL
            SELECT 'o_custkey', COUNT(o_custkey),
                   CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
                   ROUND(CAST(SUM(CAST(o_custkey AS DECIMAL(30,0))) AS DOUBLE)
                         / COUNT(o_custkey), 6)
            FROM orders
            ORDER BY 1
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n_events,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_sessionize": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "events_latest_per_user_type": """
            SELECT user_id, event_type, event_id, ts, ROUND(value, 6) AS value
            FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) = 1
            ORDER BY user_id, event_type
        """,
        "norm_fold_accents": f"""
            SELECT c_custkey,
                   translate(lower(c_name), '{ACCENT_SRC}', '{ACCENT_DST}') AS folded
            FROM customer ORDER BY c_custkey
        """,
        "norm_clean_names": f"""
            SELECT p_partkey, {clean_name_sql('p_name')} AS cleaned
            FROM part ORDER BY p_partkey
        """,
        "dual_variants_parts": f"""
            SELECT p_partkey, CAST(0 AS INT) AS variant_idx,
                   {clean_name_sql('p_name')} AS variant
            FROM part
            UNION ALL
            SELECT p_partkey, CAST(1 AS INT) AS variant_idx,
                   trim(regexp_replace(
                       translate(lower(trim(p_name)), '{ACCENT_SRC}', '{ACCENT_DST}'),
                       '\\s+', ' ', 'g')) AS variant
            FROM part
            ORDER BY p_partkey, variant_idx
        """,
        "dup_group_names": f"""
            SELECT {clean_name_sql('p_name')} AS norm_key,
                   COUNT(*) AS group_size,
                   array_to_string(list_sort(list(p_name))[1:100], '|') AS original_names
            FROM part GROUP BY 1 ORDER BY 1
        """,
        # Constant oracle: LSA must-hold invariants (factorization itself is
        # pytest-verified vs exact numpy SVD — not SQL-expressible).
        "lsa_parts_invariants": """
            SELECT COUNT(*) AS n_parts,
                   COUNT(*) AS n_embeddings,
                   COUNT(*) AS n_norm_ok,
                   true AS ortho_ok
            FROM part
        """,
        "part_substring_calibrated": """
            SELECT p_partkey, p_name,
                   ROUND(1.0 / (1.0 + exp(-((p_retailprice - 1500.0) / 200.0))), 6)
                       AS price_calib
            FROM part
            WHERE p_name LIKE '%gear%'
            ORDER BY p_partkey
        """,
        "text_stats": f"""
            SELECT doc_id,
                   len({toks}) AS n_tokens,
                   len(list_distinct({toks})) AS n_distinct,
                   ROUND({swr}, 6) AS stopword_ratio,
                   ROUND({punct}, 6) AS punct_ratio,
                   ROUND(CASE WHEN len({toks}) > 0
                              THEN CAST({nospace} AS DOUBLE) / len({toks})
                              ELSE 0.0 END, 6) AS mean_token_len
            FROM documents ORDER BY doc_id
        """,
        "text_quality_langid": f"""
            SELECT doc_id,
                   ROUND(({rep}) * 0.5 + (1.0 - ({punct})) * 0.3 + ({len_ok}) * 0.2, 6) AS quality,
                   CASE WHEN regexp_matches(text, '{_VI_CLASS}') THEN 'vi'
                        WHEN ({swr}) >= 0.05 THEN 'en'
                        ELSE 'other' END AS pred_lang
            FROM documents ORDER BY doc_id
        """,
        "text_bpe_tokens": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                       AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "bm25_docs": """
            WITH toks AS (
                SELECT doc_id AS doc, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
                FROM documents
            ), postings AS (
                SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
            ), doclens AS (
                SELECT doc, COUNT(*) AS dl FROM toks GROUP BY 1
            ), consts AS (
                SELECT (SELECT COUNT(*) FROM documents) AS n,
                       (SELECT AVG(dl) FROM doclens) AS avgdl
            ), dfs AS (
                SELECT term, COUNT(*) AS df FROM postings GROUP BY 1
            ), rawidf AS (
                -- rank_bm25.BM25Okapi idf: ln((N-df+0.5)/(df+0.5)), negative
                -- values floored to epsilon*avg_idf (avg over FULL vocab)
                SELECT term, ln((n - df + 0.5) / (df + 0.5)) AS ri
                FROM dfs, consts
            ), avgidf AS (
                SELECT CAST(SUM(CAST(ri AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS ai
                FROM rawidf
            ), idf AS (
                SELECT term, CASE WHEN ri < 0 THEN 0.25 * ai ELSE ri END AS idf
                FROM rawidf, avgidf
                WHERE term IN ('spark','table','join')
            )
            SELECT p.doc AS doc_id,
                   ROUND(CAST(SUM(CAST(
                       i.idf * (p.tf * 2.5)
                       / (p.tf + 1.5 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl))
                   AS DECIMAL(30,12))) AS DOUBLE), 6) AS bm25
            FROM postings p JOIN idf i USING (term)
                            JOIN doclens d ON p.doc = d.doc, consts c
            GROUP BY 1 ORDER BY 1
        """,
        # winnow_fingerprints twin: k-gram md5-top-15-hex hashes, rolling
        # window of w, min per window, distinct sorted; summary stats per
        # doc (xor digest folds the same way in both engines)
        "docs_winnow_fingerprints": """
            WITH c AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
                FROM documents WHERE doc_id <= 300
            ), h AS (
                SELECT doc_id,
                       CASE WHEN length(ct) = 0 THEN CAST([] AS BIGINT[])
                            ELSE [('0x' || substring(md5(substring(ct, i, 8)), 1, 15))::BIGINT
                                  for i in range(1, greatest(length(ct) - 7, 1) + 1)]
                       END AS hs
                FROM c
            ), fp AS (
                SELECT doc_id,
                       CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                            ELSE list_sort(list_distinct(
                                [list_min(hs[i : i + 3])
                                 for i in range(1, greatest(len(hs) - 3, 1) + 1)]
                            ))
                       END AS fp
                FROM h
            )
            SELECT doc_id,
                   CAST(len(fp) AS INT) AS n_fp,
                   fp[1] AS min_fp,
                   fp[-1] AS max_fp,
                   CASE WHEN len(fp) = 0 THEN 0
                        ELSE list_reduce(fp, (a, b) -> CAST(xor(a, b) AS BIGINT))
                   END AS fp_xor
            FROM fp ORDER BY doc_id
        """,
        # winnow_pairs twin: full quadratic exact-Jaccard join over the
        # winnowing fingerprint sets (lang-blocked) — the engine's lossless
        # prefix-filter plan must produce the identical pair set
        "docs_winnow_neardup": """
            WITH c AS (
                SELECT doc_id, lang,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
                FROM documents
            ), h AS (
                SELECT doc_id, lang,
                       CASE WHEN length(ct) = 0 THEN CAST([] AS BIGINT[])
                            ELSE [('0x' || substring(md5(substring(ct, i, 8)), 1, 15))::BIGINT
                                  for i in range(1, greatest(length(ct) - 7, 1) + 1)]
                       END AS hs
                FROM c
            ), fp AS (
                SELECT doc_id, lang,
                       CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                            ELSE list_distinct(
                                [list_min(hs[i : i + 3])
                                 for i in range(1, greatest(len(hs) - 3, 1) + 1)]
                            )
                       END AS fp
                FROM h
            ), sized AS (SELECT doc_id, lang, fp, len(fp) AS n FROM fp)
            SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                   ROUND(CAST(l.n + r.n - len(list_distinct(l.fp || r.fp)) AS DOUBLE)
                         / len(list_distinct(l.fp || r.fp)), 6) AS jaccard
            FROM sized l JOIN sized r
                 ON l.lang = r.lang AND l.doc_id < r.doc_id
                AND least(l.n, r.n) >= 0.5 * greatest(l.n, r.n)
            WHERE CAST(l.n + r.n - len(list_distinct(l.fp || r.fp)) AS DOUBLE)
                  / len(list_distinct(l.fp || r.fp)) >= 0.5
            ORDER BY 1, 2
        """,
        # winnow_containment_pairs twin: quadratic containment join over
        # the fingerprint sets (any qualifying pair shares >= 1 fp, so the
        # engine's exact inverted-index candidates reproduce this exactly)
        "docs_winnow_containment": """
            WITH c AS (
                SELECT doc_id, lang,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
                FROM documents
            ), h AS (
                SELECT doc_id, lang,
                       CASE WHEN length(ct) = 0 THEN CAST([] AS BIGINT[])
                            ELSE [('0x' || substring(md5(substring(ct, i, 8)), 1, 15))::BIGINT
                                  for i in range(1, greatest(length(ct) - 7, 1) + 1)]
                       END AS hs
                FROM c
            ), fp AS (
                SELECT doc_id, lang,
                       CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                            ELSE list_distinct(
                                [list_min(hs[i : i + 3])
                                 for i in range(1, greatest(len(hs) - 3, 1) + 1)]
                            )
                       END AS fp
                FROM h
            ), sized AS (SELECT doc_id, lang, fp, len(fp) AS n FROM fp),
            paired AS (
                SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                       l.n + r.n - len(list_distinct(l.fp || r.fp)) AS i,
                       least(l.n, r.n) AS mn
                FROM sized l JOIN sized r
                     ON l.lang = r.lang AND l.doc_id < r.doc_id
            )
            SELECT left_id, right_id,
                   ROUND(CAST(i AS DOUBLE) / mn, 6) AS containment,
                   CAST(i AS INT) AS n_shared
            FROM paired
            WHERE mn > 0 AND CAST(i AS DOUBLE) / mn >= 0.6
            ORDER BY 1, 2
        """,
        # char_lm_scores twin: add-α char-bigram model trained on the same
        # filtered corpus; per-bigram bits rounded to 6dp before the
        # decimal-accumulated mean (order-independent cross-engine)
        "docs_char_lm_quality": """
            WITH c AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
                FROM documents WHERE doc_id <= 300
            ), bi AS (
                SELECT doc_id,
                       unnest([substring(ct, i, 2)
                               for i in range(1, greatest(length(ct) - 1, 0) + 1)]) AS bg
                FROM c
            ), bgc AS (
                SELECT bg, COUNT(*) AS c_bg FROM bi GROUP BY bg
            ), ctx AS (
                SELECT substring(bg, 1, 1) AS c1, SUM(c_bg) AS c_ctx
                FROM bgc GROUP BY 1
            ), chars AS (
                SELECT COUNT(DISTINCT ch) AS k FROM (
                    SELECT substring(bg, 1, 1) AS ch FROM bi
                    UNION SELECT substring(bg, 2, 1) FROM bi
                )
            ), model AS (
                SELECT bg,
                       ROUND(-log2((c_bg + 0.5) / (c_ctx + 0.5 * k)), 6) AS bits
                FROM bgc JOIN ctx ON substring(bg, 1, 1) = c1, chars
            )
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   ROUND(CAST(SUM(CAST(bits AS DECIMAL(30,6))) AS DOUBLE)
                         / COUNT(*), 6) AS bits_per_bigram
            FROM bi JOIN model USING (bg)
            GROUP BY 1 ORDER BY 1
        """,
        # repetition_signals twin: identical canon, identical tie-break
        # (count DESC, gram ASC), identical 6dp-after-exact-division
        "docs_repetition_signals": """
            WITH c AS (
                SELECT doc_id, text,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
                FROM documents
            ), ln AS (
                SELECT doc_id, trim(l) AS l FROM (
                    SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                    FROM c
                ) WHERE trim(l) <> ''
            ), per_line AS (
                SELECT doc_id, l, COUNT(*) AS lc FROM ln GROUP BY doc_id, l
            ), line_stats AS (
                SELECT doc_id,
                       CAST(SUM(lc) AS BIGINT) AS n_lines,
                       ROUND(CAST(SUM(lc) - COUNT(*) AS DOUBLE)
                             / CAST(SUM(lc) AS DOUBLE), 6) AS dup_line_frac,
                       ROUND(CAST(SUM((lc - 1) * length(l)) AS DOUBLE)
                             / CAST(SUM(lc * length(l)) AS DOUBLE), 6)
                           AS dup_line_char_frac
                FROM per_line GROUP BY doc_id
            ), tok AS (
                SELECT doc_id,
                       CASE WHEN ct IS NULL OR ct = ''
                            THEN CAST([] AS VARCHAR[])
                            ELSE string_split(ct, ' ') END AS ws,
                       length(replace(coalesce(ct, ''), ' ', '')) AS dc
                FROM c
            ), w1 AS (
                SELECT doc_id, unnest(ws) AS g FROM tok
            ), t1 AS (
                SELECT doc_id, g, COUNT(*) AS gc FROM w1 GROUP BY doc_id, g
            ), topw AS (
                SELECT doc_id, gc FROM (
                    SELECT doc_id, gc, ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY gc DESC, g ASC) AS rn
                    FROM t1
                ) WHERE rn = 1
            ), g2 AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i+1])) AS g
                FROM tok WHERE len(ws) >= 2
            ), t2 AS (
                SELECT doc_id, g, COUNT(*) AS gc FROM g2 GROUP BY doc_id, g
            ), top2 AS (
                SELECT doc_id, g, gc FROM (
                    SELECT doc_id, g, gc, ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY gc DESC, g ASC) AS rn
                    FROM t2
                ) WHERE rn = 1
            ), g3 AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                           AS g
                FROM tok WHERE len(ws) >= 3
            ), t3 AS (
                SELECT doc_id, g, COUNT(*) AS gc FROM g3 GROUP BY doc_id, g
            ), top3 AS (
                SELECT doc_id, g, gc FROM (
                    SELECT doc_id, g, gc, ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY gc DESC, g ASC) AS rn
                    FROM t3
                ) WHERE rn = 1
            )
            SELECT c.doc_id,
                   COALESCE(ls.n_lines, 0) AS n_lines,
                   COALESCE(ls.dup_line_frac, 0.0) AS dup_line_frac,
                   COALESCE(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
                   CAST(len(tok.ws) AS INT) AS n_words,
                   COALESCE(ROUND(CAST(topw.gc AS DOUBLE)
                                  / CAST(len(tok.ws) AS DOUBLE), 6), 0.0)
                       AS top_word_frac,
                   COALESCE(ROUND(CAST(length(replace(top2.g, ' ', ''))
                                       * top2.gc AS DOUBLE)
                                  / CAST(tok.dc AS DOUBLE), 6), 0.0)
                       AS top_2gram_char_frac,
                   COALESCE(ROUND(CAST(length(replace(top3.g, ' ', ''))
                                       * top3.gc AS DOUBLE)
                                  / CAST(tok.dc AS DOUBLE), 6), 0.0)
                       AS top_3gram_char_frac
            FROM c
            JOIN tok USING (doc_id)
            LEFT JOIN line_stats ls USING (doc_id)
            LEFT JOIN topw USING (doc_id)
            LEFT JOIN top2 USING (doc_id)
            LEFT JOIN top3 USING (doc_id)
            ORDER BY doc_id
        """,
        # chunk dedup twins: identical tokenization (single-space split,
        # empties removed), identical 3-token windows, identical
        # keep-first total order (doc_id, chunk_idx)
        "docs_chunk_dedup_stats": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> t <> '') AS ws
                FROM documents
            ), nz AS (
                SELECT doc_id, ws FROM tok WHERE len(ws) > 0
            ), occ AS (
                SELECT doc_id,
                       array_to_string(ws[i*3+1 : i*3+3], ' ') AS chunk
                FROM (
                    SELECT doc_id, ws,
                           unnest(range(0, CAST(ceil(len(ws)/3.0) AS INT))) AS i
                    FROM nz
                )
            ), cc AS (
                SELECT doc_id,
                       COUNT(*) OVER (PARTITION BY chunk) AS n_occ
                FROM occ
            )
            SELECT doc_id,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_chunks,
                   ROUND(CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                       AS dup_chunk_ratio
            FROM cc GROUP BY doc_id ORDER BY doc_id
        """,
        "docs_chunk_dedup_keepfirst": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> t <> '') AS ws
                FROM documents
            ), nz AS (
                SELECT doc_id, ws FROM tok WHERE len(ws) > 0
            ), occ AS (
                SELECT doc_id, i AS chunk_idx,
                       array_to_string(ws[i*3+1 : i*3+3], ' ') AS chunk
                FROM (
                    SELECT doc_id, ws,
                           unnest(range(0, CAST(ceil(len(ws)/3.0) AS INT))) AS i
                    FROM nz
                )
            ), k AS (
                SELECT doc_id, chunk_idx, chunk,
                       ROW_NUMBER() OVER (
                           PARTITION BY chunk ORDER BY doc_id, chunk_idx
                       ) = 1 AS keep
                FROM occ
            )
            SELECT doc_id,
                   COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx)
                            FILTER (WHERE keep), '') AS kept_text,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_removed
            FROM k GROUP BY doc_id ORDER BY doc_id
        """,
        # sampling twins: identical md5 decision space (lowercase-hex
        # prefix vs the engine-generated threshold string), identical
        # (md5, id) total order for quotas
        "docs_hash_sample": f"""
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE substring(md5('r5' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{_sample_threshold}'
            ORDER BY doc_id
        """,
        "supplier_pagerank": _pagerank_sql(3),
        "corpus_top_tokens": r"""
            WITH t AS (
                SELECT unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '
                )) AS token
                FROM documents
                WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> ''
            )
            SELECT token, COUNT(*) AS n_occurrences
            FROM t GROUP BY token
            ORDER BY n_occurrences DESC, token ASC
            LIMIT 100
        """,
        # report-card twin: mean quality decimal-accumulated like the
        # engine (order-independent sum of 6dp-rounded scores)
        "source_report_card": f"""
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len({toks})) AS BIGINT) AS n_tokens,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                   round(CAST(SUM(CAST(
                       ROUND(({rep}) * 0.5 + (1.0 - ({punct})) * 0.3
                             + ({len_ok}) * 0.2, 6)
                       AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
                       AS mean_quality,
                   round(CAST(COUNT(DISTINCT {_fingerprint('text')})
                              AS DOUBLE) / COUNT(*), 6) AS distinct_frac,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY source ORDER BY source
        """,
        # temperature resampling twin: rate = sqrt(n_min/n_lang) —
        # sqrt/div/mul/floor are IEEE-correctly-rounded in both engines,
        # so the per-row threshold string is byte-identical
        "docs_temperature_sample": """
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
            r AS (
                SELECT lang,
                       sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE)
                            / CAST(n AS DOUBLE)) AS rate
                FROM c
            )
            SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE r.rate >= 1.0
               OR substring(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  < printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT))
            ORDER BY d.doc_id
        """,
        "docs_split_assign": f"""
            SELECT doc_id,
                   CASE WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{_split_cut_train}' THEN 'train'
                        WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
                             < '{_split_cut_val}' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        # per-language quality gate twin: integer-rational rank cutoff
        # (den*rank <= num*n + den-1 <=> rank <= ceil(num*n/den)) — no
        # float fraction-of-count anywhere
        "docs_lang_quality_gate": f"""
            WITH q AS (
                SELECT doc_id, lang,
                       ROUND(({rep}) * 0.5 + (1.0 - ({punct})) * 0.3
                             + ({len_ok}) * 0.2, 6) AS quality
                FROM documents
            )
            SELECT doc_id, lang, quality
            FROM q
            QUALIFY 10 * ROW_NUMBER() OVER (
                        PARTITION BY lang ORDER BY quality DESC, doc_id
                    ) <= 9 * COUNT(*) OVER (PARTITION BY lang) + 9
            ORDER BY doc_id
        """,
        "docs_source_quota": """
            SELECT doc_id, source
            FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ) <= 40
            ORDER BY doc_id
        """,
        # packing twins: the NAIVE global-window exclusive cumsum — the
        # engine runs the two-pass distributed scan; their equality is
        # the scan's correctness claim
        "docs_pack_assignments": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS start_offset
                FROM t
            )
            SELECT doc_id, n_tokens, start_offset,
                   CAST(start_offset // 512 AS BIGINT) AS example_id,
                   CAST((start_offset + greatest(n_tokens, 1) - 1) // 512
                        - start_offset // 512 AS BIGINT) AS n_boundaries
            FROM c ORDER BY doc_id
        """,
        "docs_pack_examples": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_offset
                FROM t
            )
            SELECT CAST(start_offset // 512 AS BIGINT) AS example_id,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   MIN(doc_id) AS first_doc_id,
                   MAX(doc_id) AS last_doc_id
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # Extraction byte-identity: the same render (entity-escape + tag
        # template) and the same extraction chain (tag-strip -> entity
        # replaces in the engine's exact order, &amp; LAST -> ws collapse
        # -> trim) stated in DuckDB. Hash equality proves the Spark
        # codegen extractor is engine-portable and exactly ordered.
        "pages_extract_text": """
            WITH page AS (
                SELECT doc_id, text,
                       '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
                       || '</title></head><body><nav>home &amp; index '
                       || '&amp;lt;nav&amp;gt;</nav><h1>'
                       || replace(replace(replace(text,
                              '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
                       || '</h1><p class="meta">&quot;' || source
                       || '&quot; &#39;' || lang
                       || '&#x27;</p></body></html>' AS html
                FROM documents
            ), ext AS (
                SELECT doc_id, text,
                       trim(regexp_replace(
                           replace(replace(replace(replace(replace(replace(
                               replace(
                                   regexp_replace(html, '<[^>]+>', ' ', 'g'),
                               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                               '&#x27;', ''''), '&#39;', ''''),
                               '&nbsp;', ' '), '&amp;', '&'),
                           '\\s+', ' ', 'g')) AS extracted_text
                FROM page
            )
            SELECT doc_id, extracted_text,
                   CAST(CASE WHEN position(text IN extracted_text) > 0
                             THEN 1 ELSE 0 END AS INTEGER) AS mention_intact
            FROM ext ORDER BY doc_id
        """,
        # URL canonicalization + latest-snapshot window stated verbatim:
        # lowercase scheme/host, strip default port, drop fragment, drop
        # tracking params keeping survivor order, empty path -> '/'.
        "urls_canonical_latest": """
            WITH synth AS (
                SELECT
                    (CASE WHEN doc_id % 2 = 0 THEN 'https://'
                          ELSE 'HTTPS://' END)
                    || (CASE WHEN doc_id % 3 = 0
                             THEN source || '.Example.COM:443'
                             ELSE source || '.example.com' END)
                    || '/p/' || CAST(doc_id % 7 AS VARCHAR)
                    || (CASE WHEN doc_id % 4 = 0
                             THEN '?utm_source=feed&page='
                                  || CAST(doc_id % 5 AS VARCHAR)
                             WHEN doc_id % 4 = 1
                             THEN '?page=' || CAST(doc_id % 5 AS VARCHAR)
                                  || '&gclid=zz'
                             WHEN doc_id % 4 = 2 THEN '?utm_campaign=x'
                             ELSE '' END)
                    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
                        AS url,
                    CAST(1767225600 + (doc_id % 13) AS BIGINT) AS warc_ts
                FROM documents
            ), parsed AS (
                SELECT url, warc_ts,
                    lower(coalesce(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
                    lower(coalesce(regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''))
                        AS hostport,
                    coalesce(regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '')
                        AS pathq
                FROM synth
            ), canon AS (
                SELECT url, warc_ts, scheme,
                    CASE WHEN scheme = 'https'
                         THEN regexp_replace(hostport, ':443$', '')
                         WHEN scheme = 'http'
                         THEN regexp_replace(hostport, ':80$', '')
                         ELSE hostport END AS host,
                    CASE WHEN coalesce(regexp_extract(pathq,
                             '^([^?]*)', 1), '') = '' THEN '/'
                         ELSE regexp_extract(pathq, '^([^?]*)', 1)
                         END AS path,
                    -- array_to_string([]) is NULL in DuckDB (Spark's
                    -- array_join gives ''): coalesce to match.
                    coalesce(array_to_string(list_filter(
                        string_split(coalesce(regexp_extract(pathq,
                            '^[^?]*\\?(.*)$', 1), ''), '&'),
                        p -> p <> '' AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid)(=.*)?$')), '&'), '')
                        AS kept_q
                FROM parsed
            ), c2 AS (
                SELECT url, warc_ts,
                    scheme || '://' || host || path
                    || (CASE WHEN kept_q = '' THEN ''
                             ELSE '?' || kept_q END) AS canonical_url
                FROM canon
            ), ranked AS (
                SELECT canonical_url, url, warc_ts,
                    ROW_NUMBER() OVER (PARTITION BY canonical_url
                        ORDER BY warc_ts DESC, url ASC) AS rn,
                    COUNT(*) OVER (PARTITION BY canonical_url)
                        AS n_snapshots
                FROM c2
            )
            SELECT canonical_url, url, warc_ts,
                   CAST(n_snapshots AS BIGINT) AS n_snapshots
            FROM ranked WHERE rn = 1 ORDER BY canonical_url
        """,
        # Decontamination twin: identical stride-1 3-token shingling,
        # per-doc distinct, benchmark = every 41st doc, count of shared
        # distinct shingles per corpus doc; clean docs kept with zeros.
        "docs_decontaminate": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> t <> '')
                           AS ws
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, len(ws) - 1),
                           i -> array_to_string(
                               list_slice(ws, i, i + 2), ' ')))) AS shingle
                FROM tok WHERE len(ws) >= 3
            ), bench AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 41 = 0
            ), hits AS (
                SELECT doc_id, COUNT(*) AS n
                FROM sh JOIN bench USING (shingle)
                WHERE doc_id % 41 <> 0
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n, 0) AS BIGINT)
                       AS n_contaminated_shingles,
                   CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END
                        AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id % 41 <> 0 ORDER BY d.doc_id
        """,
        # C4 line-clean twin: identical page synthesis (per-source line
        # concatenation ordered by doc_id, planted rule-triggers) and the
        # identical line/page rules stated in DuckDB lambdas.
        "docs_c4_line_clean": """
            WITH ln AS (
                SELECT source, doc_id,
                       (CASE WHEN doc_id % 5 = 0
                             THEN array_to_string(list_slice(
                                  string_split(text, ' '), 1, 3), ' ')
                             ELSE text END)
                       || (CASE WHEN doc_id % 7 = 0
                                THEN ' see javascript' ELSE '' END)
                       || (CASE WHEN doc_id % 3 = 0 THEN '.'
                                WHEN doc_id % 3 = 1 THEN '!'
                                ELSE '' END) AS line
                FROM documents
            ), page AS (
                SELECT source,
                       string_agg(line, chr(10) ORDER BY doc_id) AS text
                FROM ln GROUP BY source
            ), page2 AS (
                SELECT source,
                       CASE WHEN source = 'src1'
                            THEN text || chr(10)
                                 || 'lorem ipsum filler text here.'
                            WHEN source = 'src2'
                            THEN text || chr(10)
                                 || 'config { jsonish } block.'
                            ELSE text END AS text
                FROM page
            ), split AS (
                SELECT source, text,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM page2
            ), judged AS (
                SELECT source, text, lines,
                       list_filter(lines, x ->
                           len(list_filter(string_split(x, ' '),
                               w -> w <> '')) >= 5
                           AND regexp_matches(x, '[.!?\"]$')
                           AND NOT contains(lower(x), 'javascript'))
                           AS kept
                FROM split
            )
            SELECT source,
                   coalesce(array_to_string(kept, chr(10)), '')
                       AS clean_text,
                   CAST(len(kept) AS INTEGER) AS n_lines_kept,
                   CAST(len(lines) - len(kept) AS INTEGER)
                       AS n_lines_dropped,
                   CAST(CASE WHEN len(kept) >= 3
                             AND NOT contains(lower(text), 'lorem ipsum')
                             AND NOT contains(text, '{')
                             THEN 1 ELSE 0 END AS INTEGER) AS page_kept
            FROM judged ORDER BY source
        """,
        "customers_pii_redacted": f"""
            WITH d AS (
                SELECT c_custkey,
                       concat_ws(' ', c_name,
                           'user' || CAST(c_custkey AS VARCHAR)
                                  || '@example.com',
                           '555-'
                               || lpad(CAST((c_custkey*7)%1000 AS VARCHAR),
                                       3, '0')
                               || '-'
                               || lpad(CAST((c_custkey*13)%10000 AS VARCHAR),
                                       4, '0'),
                           CAST(c_custkey%256 AS VARCHAR) || '.'
                               || CAST((c_custkey*3)%256 AS VARCHAR) || '.'
                               || CAST((c_custkey*5)%256 AS VARCHAR) || '.'
                               || CAST((c_custkey*7)%256 AS VARCHAR),
                           c_mktsegment) AS contact
                FROM customer
            )
            SELECT c_custkey,
                   {_pii_redact_sql} AS redacted,
                   CAST({_pii_count_sqls[0]} AS BIGINT) AS n_email,
                   CAST({_pii_count_sqls[1]} AS BIGINT) AS n_ipv4,
                   CAST({_pii_count_sqls[2]} AS BIGINT) AS n_phone,
                   CAST({_pii_count_sqls[3]} AS BIGINT) AS n_ssn
            FROM d ORDER BY c_custkey
        """,
        "docs_fingerprint_groups": f"""
            SELECT {_fingerprint('text')} AS fingerprint,
                   COUNT(*) AS group_size, MIN(doc_id) AS canonical_id
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "docs_keep_longest": f"""
            SELECT doc_id, {_fingerprint('text')} AS fingerprint, n_chars
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY {_fingerprint('text')}
                                       ORDER BY length(text) DESC, doc_id ASC) = 1
            ORDER BY doc_id
        """,
        "docs_jaccard_neardup": """
            WITH t AS (
                SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
                FROM documents
            )
            SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                   ROUND(CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                         / len(list_distinct(l.toks || r.toks)), 6) AS jaccard
            FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
            WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                  / len(list_distinct(l.toks || r.toks)) >= 0.8
            ORDER BY 1, 2
        """,
        "emb_neardup": f"""
            WITH {lsh_buckets_cte(4, 8, 64)}, cand AS (
                SELECT DISTINCT b1.vec_id AS left_id, b2.vec_id AS right_id
                FROM buckets b1 JOIN buckets b2 USING (bucket)
                WHERE b1.vec_id < b2.vec_id
            )
            SELECT c.left_id, c.right_id, {cosine} AS cosine
            FROM cand c
            JOIN embeddings l ON l.vec_id = c.left_id
            JOIN embeddings r ON r.vec_id = c.right_id
            -- 0.3 (not 0.9): the synthetic embeddings are unstructured
            -- (max pairwise cos ~0.49); 0.3 makes the pair-emission path
            -- oracle-exercised on a non-empty result (VERDICT r3 #2)
            WHERE {cosine} >= 0.3
            ORDER BY 1, 2
        """,
        "ann_topk": f"""
            WITH scored AS (
                SELECT l.vec_id AS query_id, r.vec_id AS neighbor_id, {cosine} AS cosine
                FROM embeddings l JOIN embeddings r ON l.vec_id != r.vec_id
                WHERE l.vec_id < 10
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "multimodal_meta": """
            SELECT doc_id AS content_id, 'txt' AS format,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                   md5(text) AS checksum
            FROM documents ORDER BY content_id
        """,
        "multimodal_features": f"""
            SELECT doc_id AS content_id,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                   4 AS feature_dim,
                   ROUND(CASE WHEN len({toks}) > 0
                              THEN CAST({nospace} AS DOUBLE) / len({toks})
                              ELSE 0.0 END, 6) AS mean_tok_len
            FROM documents ORDER BY content_id
        """,
        # resize oracle: pixel (r,c) of the 2x2 mean-pool over the 4x4 fake
        # image whose row-major bytes are md5(text) bytes 0..15; byte j =
        # ('0x' || substr(md5, 2j+1, 2))::INT. Means of 4 uint8s over 4.0
        # are exact binary fractions, so ROUND(..,6) matches bit-for-bit.
        "multimodal_resize": """
            WITH b AS (
                SELECT doc_id AS content_id, md5(text) AS h FROM documents
            ), px AS (
                SELECT content_id,
                       [('0x' || substring(h, 2*j + 1, 2))::INT
                        for j in range(0, 16)] AS p
                FROM b
            )
            SELECT content_id,
                   ROUND((p[1] + p[2] + p[5] + p[6]) / 4.0, 6) AS p00,
                   ROUND((p[3] + p[4] + p[7] + p[8]) / 4.0, 6) AS p01,
                   ROUND((p[9] + p[10] + p[13] + p[14]) / 4.0, 6) AS p10,
                   ROUND((p[11] + p[12] + p[15] + p[16]) / 4.0, 6) AS p11
            FROM px ORDER BY content_id
        """,
        "rrf_part_ranking": """
            WITH price_rank AS (
                SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
                FROM part
            ), size_rank AS (
                SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY CAST(p_size AS DOUBLE) DESC, p_partkey ASC) AS rn
                FROM part
            )
            SELECT COALESCE(a.p_brand, b.p_brand) AS p_brand,
                   COALESCE(a.p_partkey, b.p_partkey) AS p_partkey,
                   ROUND(COALESCE(1.0/(60+a.rn), 0) + COALESCE(1.0/(60+b.rn), 0), 6) AS rrf_score
            FROM price_rank a FULL OUTER JOIN size_rank b
                 ON a.p_brand = b.p_brand AND a.p_partkey = b.p_partkey
            ORDER BY 1, 2
        """,
        "top3_parts_per_brand": """
            SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                        ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rank
            FROM part
            QUALIFY rank <= 3
            ORDER BY p_brand, rank
        """,
        # SimHash is fully SQL-expressible: the 64-bit signature is md5-token
        # bit math (('0x'||substr(md5,1,16))::UBIGINT is byte-identical to
        # the engine's digest[:8] big-endian), and the engine's 4×16-bit band
        # join is PIGEONHOLE-EXACT for hamming ≤ 3 (≤3 differing bits across
        # 4 chunks ⇒ ≥1 chunk equal), so its output provably equals this
        # quadratic all-pairs oracle.
        "docs_simhash_neardup": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
                FROM documents WHERE trim(text) <> ''
            ), h AS (
                SELECT doc_id,
                       ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS hv
                FROM toks
            ), bits AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (hv >> (63 - i)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                FROM h, (SELECT unnest(range(0, 64)) AS i) g
                GROUP BY 1, 2
            ), sig0 AS (
                SELECT doc_id,
                       SUM(CASE WHEN acc > 0
                                THEN (1::UBIGINT << (63 - i)) ELSE 0 END) AS sig
                FROM bits GROUP BY 1
            ), sig AS (
                SELECT d.doc_id, COALESCE(s.sig, 0)::UBIGINT AS sig
                FROM documents d LEFT JOIN sig0 s USING (doc_id)
            )
            SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                   CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
            FROM sig l JOIN sig r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.sig, r.sig)) <= 3
            ORDER BY 1, 2
        """,
        # The exact comparator for MinHash-LSH: all-pairs char-trigram-set
        # Jaccard ≥ 0.8 (same trigram definition as scoring.trigram_strings_col
        # — substr windows over whitespace-collapsed lowered text, min 1 gram).
        # MinHash banding is probabilistic in general, but deterministic for a
        # fixed dataset+seed: verified to have 100% recall on the sf0.001 and
        # sf0.01 corpora, so the entry's banded+verified output equals this
        # quadratic oracle exactly (a recall miss would surface as a red row —
        # which is precisely what this gate is for).
        # erroranalysis.tag_col twin: every failure-category predicate of
        # analyze_errors.py categorize_query as RE2-safe SQL over the same
        # deterministic corrupted-query workload as the entry.
        "error_tags_parts": f"""
            WITH base AS (
                SELECT p_name AS target,
                       CASE CAST(p_partkey % 3 AS INT)
                         WHEN 0 THEN upper(array_to_string(list_reverse(
                             regexp_split_to_array(trim(p_name), '\\s+')), ' '))
                         WHEN 1 THEN lower(array_to_string(
                             regexp_split_to_array(trim(p_name), '\\s+')[1:2], ' '))
                         ELSE lower(p_name) END AS q0,
                       CASE CAST(p_partkey % 3 AS INT)
                         WHEN 0 THEN 'reorder_upper'
                         WHEN 1 THEN 'truncate'
                         ELSE 'lowercase' END AS method
                FROM part WHERE p_partkey <= 500
            ),
            feat AS (
                SELECT method, trim(q0) AS q, trim(target) AS t,
                       regexp_replace(trim(q0), '[^\\p{{L}}]', '', 'g') AS letters,
                       regexp_split_to_array(trim(q0), '\\s+') AS qw,
                       regexp_split_to_array(trim(target), '\\s+') AS tw,
                       lower(translate(trim(q0), '{ACCENT_SRC}', '{ACCENT_DST}')) AS qfold,
                       lower(translate(trim(target), '{ACCENT_SRC}', '{ACCENT_DST}')) AS tfold,
                       list_filter(list_distinct(
                           regexp_split_to_array(trim(lower(q0)), '\\s+')),
                           x -> x != '') AS qs,
                       list_filter(list_distinct(
                           regexp_split_to_array(trim(lower(target)), '\\s+')),
                           x -> x != '') AS ts
                FROM base
            ),
            pred AS (
                SELECT *,
                       (letters != '' AND letters = upper(letters)) AS all_upper,
                       list_sort(list_distinct(regexp_split_to_array(qfold, '\\s+')))
                         = list_sort(list_distinct(regexp_split_to_array(tfold, '\\s+')))
                         AS same_set,
                       CASE WHEN len(list_distinct(qs || ts)) > 0
                            THEN CAST(len(qs) + len(ts)
                                      - len(list_distinct(qs || ts)) AS DOUBLE)
                                 / len(list_distinct(qs || ts))
                            ELSE 0.0 END AS overlap
                FROM feat
            ),
            tags AS (
                SELECT unnest(list_filter([
                    'method:' || method,
                    CASE WHEN q = translate(q, '{ACCENT_SRC}', '{ACCENT_DST}')
                         THEN 'no_accent' ELSE 'accented' END,
                    CASE WHEN all_upper THEN 'all_upper'
                         WHEN q = lower(q) THEN 'all_lower'
                         ELSE 'mixed_case' END,
                    CASE WHEN len(qw) = 1 THEN 'single_token'
                         WHEN len(qw) <= 3 THEN 'short_query'
                         ELSE 'long_query' END,
                    CASE WHEN (len(qw) = 1 AND length(qw[1]) <= 6 AND len(tw) >= 2)
                           OR (len(qw) <= len(tw) / 2.0 AND all_upper)
                         THEN 'abbreviated' END,
                    CASE WHEN same_set AND qfold != tfold
                         THEN 'word_reorder' END,
                    CASE WHEN overlap = 0.0 THEN 'no_token_overlap'
                         WHEN overlap < 0.3 THEN 'low_token_overlap' END
                ], x -> x IS NOT NULL)) AS tag
                FROM pred
            )
            SELECT tag, COUNT(*) AS n FROM tags
            GROUP BY tag ORDER BY n DESC, tag
        """,
        "threshold_sweep_docs": f"""
            WITH t AS (
                SELECT doc_id, lang, {_fingerprint('text')} AS fp,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
                FROM documents
            ), p AS (
                SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                       ROUND(CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                             / len(list_distinct(l.toks || r.toks)), 6) AS s,
                       (l.fp = r.fp) AS c
                FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
                WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                      / len(list_distinct(l.toks || r.toks)) >= 0.8
            ), bi AS (
                SELECT left_id AS qid, right_id AS pid, s, c FROM p
                UNION ALL
                SELECT right_id AS qid, left_id AS pid, s, c FROM p
            ), best AS (
                SELECT qid, s, c,
                       ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY s DESC, pid ASC) AS rn
                FROM bi QUALIFY rn = 1
            ), recs AS (
                SELECT d.doc_id,
                       COALESCE(b.s, 0.0) AS top1_score,
                       COALESCE(b.c, FALSE) AS is_correct
                FROM documents d LEFT JOIN best b ON d.doc_id = b.qid
            ), th AS (
                SELECT CAST(v.t AS DOUBLE) AS threshold
                FROM (VALUES (0.0),(0.8),(0.85),(0.9),(0.95),(1.0)) v(t)
            ), agg AS (
                SELECT threshold,
                       CAST(SUM(CASE WHEN top1_score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS answered,
                       CAST(SUM(CASE WHEN top1_score >= threshold AND is_correct THEN 1 ELSE 0 END) AS BIGINT) AS correct,
                       COUNT(*) AS total
                FROM recs CROSS JOIN th GROUP BY threshold
            ), m AS (
                SELECT threshold, answered, correct,
                       ROUND(CAST(answered AS DOUBLE) / total * 100.0, 6) AS coverage,
                       ROUND(CASE WHEN answered > 0
                             THEN CAST(correct AS DOUBLE) / answered * 100.0
                             ELSE 0.0 END, 6) AS precision
                FROM agg
            )
            SELECT threshold, answered, correct, coverage, precision,
                   ROUND(CASE WHEN precision + coverage > 0
                         THEN 1.25 * precision * coverage / (0.25 * precision + coverage)
                         ELSE 0.0 END, 6) AS f05
            FROM m ORDER BY threshold
        """,
        "docs_minhash_neardup":"""
            WITH c AS (
                SELECT doc_id,
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ctext
                FROM documents
            ), tg AS (
                SELECT doc_id,
                       list_distinct([substring(ctext, i, 3)
                                      for i in range(1, greatest(length(ctext) - 2, 1) + 1)]) AS tg
                FROM c
            ), sized AS (SELECT doc_id, tg, len(tg) AS n FROM tg)
            SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                   ROUND(CAST(len(list_intersect(l.tg, r.tg)) AS DOUBLE)
                         / (l.n + r.n - len(list_intersect(l.tg, r.tg))), 6) AS jaccard
            FROM sized l JOIN sized r
                 ON l.doc_id < r.doc_id
                AND least(l.n, r.n) >= 0.8 * greatest(l.n, r.n)
            WHERE CAST(len(list_intersect(l.tg, r.tg)) AS DOUBLE)
                  / (l.n + r.n - len(list_intersect(l.tg, r.tg))) >= 0.8
            ORDER BY 1, 2
        """,
        # The IVF oracle replicates the ALGORITHM, not just the answer:
        # md5-ordered pivot sample, 6dp-rounded-cosine nearest-cell
        # assignment, nprobe=6 probing, exact re-rank — an executable SQL
        # spec of ann.ivf_topk. (ann_lsh_topk stays rows-only: seeded float
        # hyperplanes have no SQL twin.)
        "ann_ivf_topk": f"""
            WITH pivots AS (
                SELECT vec_id AS cell_id, embedding AS p_v
                FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                LIMIT 10
            ), assign AS (
                SELECT e.vec_id AS neighbor_id, p.cell_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                           round(list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]),
                               CAST(p.p_v AS DOUBLE[])), 6) DESC,
                           p.cell_id ASC) AS rn
                FROM embeddings e CROSS JOIN pivots p
                QUALIFY rn = 1
            ), probes AS (
                SELECT q.vec_id AS query_id, p.cell_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           round(list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(p.p_v AS DOUBLE[])), 6) DESC,
                           p.cell_id ASC) AS rn
                FROM embeddings q CROSS JOIN pivots p
                WHERE q.vec_id < 10
                QUALIFY rn <= 6
            ), cand AS (
                SELECT DISTINCT pr.query_id, a.neighbor_id
                FROM probes pr JOIN assign a USING (cell_id)
                WHERE pr.query_id != a.neighbor_id
            ), scored AS (
                SELECT c.query_id, c.neighbor_id, {cosine} AS cosine
                FROM cand c
                JOIN embeddings l ON l.vec_id = c.query_id
                JOIN embeddings r ON r.vec_id = c.neighbor_id
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "tfidf_rerank_parts": """
            WITH s1 AS (
                SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
                FROM part
            )
            SELECT s.p_brand, s.p_partkey,
                   ROUND(COALESCE(CAST(p.p_size AS DOUBLE), 0.0), 6) AS rerank_score
            FROM s1 s JOIN part p
                 ON s.p_brand = p.p_brand AND s.p_partkey = p.p_partkey
            WHERE s.rn <= 5
            ORDER BY 1, 2
        """,
        "union_rerank_parts": """
            WITH s1 AS (
                SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
                FROM part
            ), s2 AS (
                SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY CAST(p_size AS DOUBLE) DESC, p_partkey ASC) AS rn
                FROM part
            ), u AS (
                SELECT p_brand, p_partkey FROM s1 WHERE rn <= 5
                UNION
                SELECT p_brand, p_partkey FROM s2 WHERE rn <= 5
            )
            SELECT u.p_brand, u.p_partkey,
                   ROUND(COALESCE(CAST(p.p_size AS DOUBLE), 0.0), 6) AS rerank_score
            FROM u JOIN part p
                 ON u.p_brand = p.p_brand AND u.p_partkey = p.p_partkey
            ORDER BY 1, 2
        """,
        "match_confidence_tiers": """
            WITH t AS (
                SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
                FROM documents
            ), j AS (
                SELECT ROUND(CAST(len(l.toks) + len(r.toks)
                                  - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                             / len(list_distinct(l.toks || r.toks)), 6) AS jaccard
                FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
                WHERE CAST(len(l.toks) + len(r.toks)
                           - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                      / len(list_distinct(l.toks || r.toks)) >= 0.8
            )
            SELECT CASE WHEN jaccard >= 0.90 THEN 'high'
                        WHEN jaccard >= 0.75 THEN 'medium'
                        ELSE 'low' END AS match_confidence,
                   COUNT(*) AS n
            FROM j GROUP BY 1 ORDER BY 1
        """,
        # Invariant oracles: the fuzzy engine output is not SQL-computable,
        # but its must-hold properties are a-priori known constants — any
        # blocking/scoring/clustering regression turns these rows red.
        "search_parts_self": """
            SELECT COUNT(*) AS n_queries,
                   COUNT(*) AS n_rank1_self,
                   CAST(0 AS BIGINT) AS n_missed
            FROM part WHERE p_partkey <= 300
        """,
        "search_parts_hybrid": """
            SELECT COUNT(*) AS n_queries,
                   COUNT(*) AS n_rank1_self,
                   CAST(0 AS BIGINT) AS n_missed
            FROM part WHERE p_partkey <= 200
        """,
        "er_cluster_exact_parts": f"""
            SELECT MIN(p_partkey) AS cluster_min_partkey,
                   COUNT(*) AS cluster_size
            FROM part
            GROUP BY {clean_name_sql('p_name')}
            ORDER BY 1
        """,
        "er_invariants_parts": """
            SELECT COUNT(*) AS n_records,
                   COUNT(*) AS n_assigned,
                   CAST(0 AS BIGINT) AS n_multi_assigned,
                   CAST(0 AS BIGINT) AS n_samekey_split,
                   CAST(0 AS BIGINT) AS n_bad_center
            FROM part
        """,
        "ann_lsh_topk": f"""
            WITH {lsh_buckets_cte(4, 8, 64)}, cand AS (
                SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                FROM buckets q JOIN buckets c USING (bucket)
                WHERE q.vec_id < 10 AND q.vec_id != c.vec_id
            ), scored AS (
                SELECT cd.query_id, cd.neighbor_id, {cosine} AS cosine
                FROM cand cd
                JOIN embeddings l ON l.vec_id = cd.query_id
                JOIN embeddings r ON r.vec_id = cd.neighbor_id
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        # Constant oracle: the a-priori-correct outcome of the fuzzy ER
        # pipeline on the deterministic labeled fixture corpus (100 entities
        # x 4 variants, seed 42). fp=fn=0 and n_clusters=100 are the
        # north-rule acceptance (pairwise F1=1.0); tp=906/n_records=472 are
        # the committed deterministic fixture values.
        "er_f1_labeled": """
            SELECT CAST(472 AS BIGINT) AS n_records,
                   CAST(100 AS BIGINT) AS n_clusters,
                   CAST(906 AS BIGINT) AS match_tp,
                   CAST(0 AS BIGINT) AS match_fp,
                   CAST(0 AS BIGINT) AS match_fn,
                   CAST(906 AS BIGINT) AS cluster_tp,
                   CAST(0 AS BIGINT) AS cluster_fp,
                   CAST(0 AS BIGINT) AS cluster_fn
        """,
        # er_cluster_parts: rows-only (iterative fuzzy clustering assignment
        # — no SQL twin); invariants/exact-CC twins cover the machinery.
        # The iterative CC itself IS oracle-backed with fuzzy edges below:
        # jaccard>=0.8 pair edges (same SQL as docs_jaccard_neardup) +
        # transitive closure via recursive min-label reachability. Closure
        # row count is sum(cluster_size^2) — bounded at oracle scale
        # (sf0.01: ~28k rows, clusters up to 143).
        "er_cluster_jaccard_docs": r"""
            WITH RECURSIVE t AS (
                SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
                FROM documents
            ),
            pairs AS (
                SELECT l.doc_id AS a, r.doc_id AS b
                FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
                WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                      / len(list_distinct(l.toks || r.toks)) >= 0.8
            ),
            edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION
                SELECT b AS src, a AS dst FROM pairs
            ),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.dst AS node, r.lab
                FROM reach r JOIN edges e ON e.src = r.node
            ),
            cc AS (
                SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
            )
            SELECT c.doc_id, c.cluster_id, s.cluster_size
            FROM cc c
            JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id) s
            USING (cluster_id)
            ORDER BY c.doc_id
        """,
        # FULL fuzzy ER replay (er_cluster_fuzzy_parts): the engine's
        # normalize (clean_name_sql twin; match_key == cleaned on part
        # names, pytest-asserted) → every pair decision of the
        # jaccard+lev scorer (exact-key pairs score 1.0; fused
        # 0.6·J + 0.4·lev_sim ≥ 0.86 — the 0.0-weight channels add
        # exactly 0.0 in doubles, so this is bit-equal to the engine's
        # 4-term fold) → recursive-CTE transitive closure. Quadratic
        # join is fine at sf0.01 (2000 parts); the engine side proves
        # the same answer from a sub-quadratic lossless plan.
        "er_cluster_fuzzy_parts": f"""
            WITH RECURSIVE {_fuzzy_parts_cc_ctes()}
            SELECT CAST(c.p_partkey AS BIGINT) AS p_partkey,
                   CAST(c.cluster_rep AS BIGINT) AS cluster_rep,
                   s.cluster_size
            FROM cc c
            JOIN (SELECT cluster_rep, COUNT(*) AS cluster_size
                  FROM cc GROUP BY cluster_rep) s
            USING (cluster_rep)
            ORDER BY c.p_partkey
        """,
        # Golden-record survivorship over the SAME fuzzy closure (shared
        # CTE chain — the clustering audited here is byte-identical to
        # er_cluster_fuzzy_parts'): per cluster, most frequent raw p_name,
        # ties → longest → lexicographically smallest (binary collation
        # both engines on ASCII part names).
        "er_golden_records_parts": f"""
            WITH RECURSIVE {_fuzzy_parts_cc_ctes()},
            cells AS (
                SELECT c.cluster_rep, p.p_name AS name, COUNT(*) AS cnt
                FROM cc c JOIN part p ON p.p_partkey = c.p_partkey
                GROUP BY 1, 2
            ),
            best AS (
                SELECT cluster_rep, name,
                       row_number() OVER (
                           PARTITION BY cluster_rep
                           ORDER BY cnt DESC, length(name) DESC, name ASC
                       ) AS rn
                FROM cells
            ),
            sizes AS (
                SELECT cluster_rep, SUM(cnt) AS n_records,
                       COUNT(*) AS n_distinct_names
                FROM cells GROUP BY cluster_rep
            )
            SELECT CAST(b.cluster_rep AS BIGINT) AS cluster_rep,
                   b.name AS canonical_name,
                   CAST(s.n_records AS BIGINT) AS n_records,
                   CAST(s.n_distinct_names AS BIGINT) AS n_distinct_names
            FROM best b JOIN sizes s USING (cluster_rep)
            WHERE b.rn = 1
            ORDER BY cluster_rep
        """,
        # Per-cluster over-merge audit on the jaccard>=0.8 doc clusters:
        # same recursive closure as er_cluster_jaccard_docs plus intra-edge
        # stats. Density doubles mirror the engine op-for-op (2.0 double ×
        # bigint edge count / bigint pair count); the mean accumulates
        # 6dp-rounded scores as DECIMAL(18,6) (order-independent) exactly
        # like clustering.cluster_stats.
        "er_cluster_stats_docs": r"""
            WITH RECURSIVE t AS (
                SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
                FROM documents
            ),
            pairs AS (
                SELECT l.doc_id AS a, r.doc_id AS b,
                       round(CAST(len(l.toks) + len(r.toks)
                                  - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                             / len(list_distinct(l.toks || r.toks)), 6) AS s
                FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
                WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                      / len(list_distinct(l.toks || r.toks)) >= 0.8
            ),
            edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION
                SELECT b AS src, a AS dst FROM pairs
            ),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.dst AS node, r.lab
                FROM reach r JOIN edges e ON e.src = r.node
            ),
            cc AS (
                SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
            ),
            sizes AS (
                SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id
            ),
            es AS (
                SELECT c.cluster_id,
                       COUNT(*) AS n_intra_edges,
                       MIN(round(p.s, 6)) AS min_edge_score,
                       round(CAST(SUM(CAST(round(p.s, 6) AS DECIMAL(18,6)))
                                  AS DOUBLE) / COUNT(*), 6) AS mean_edge_score
                FROM pairs p JOIN cc c ON c.doc_id = p.a
                GROUP BY c.cluster_id
            )
            SELECT s.cluster_id, s.cluster_size,
                   COALESCE(e.n_intra_edges, 0) AS n_intra_edges,
                   CASE WHEN s.cluster_size > 1
                        THEN round(CAST(2.0 AS DOUBLE) * COALESCE(e.n_intra_edges, 0)
                                   / (s.cluster_size * (s.cluster_size - 1)), 6)
                        ELSE CAST(1.0 AS DOUBLE) END AS density,
                   e.min_edge_score, e.mean_edge_score
            FROM sizes s LEFT JOIN es e USING (cluster_id)
            ORDER BY s.cluster_id
        """,
        # Deterministic parallel pivot clustering (ACN'08 / CDK KDD'14),
        # replayed round-by-round as chained CTEs — see _pivot_docs_ctes.
        "er_cluster_pivot_docs": _pivot_docs_sql(rounds=8),
        # Correlation-clustering objective of BOTH labelings (recursive
        # closure + pivot rounds) over one shared edge CTE; disagreements
        # = cut edges + co-clustered non-edges, exact integers.
        "er_cc_objective_docs": _cc_objective_sql(rounds=8),
        # Mutual top-3 kNN edge sparsification: per-node ranking window
        # (score desc, neighbor asc) over the symmetric fan-out; an edge
        # survives with two votes (top-k for BOTH endpoints).
        "docs_sparsify_edges": r"""
            WITH t AS (
                SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
                FROM documents
            ),
            pairs AS (
                SELECT l.doc_id AS a, r.doc_id AS b,
                       round(CAST(len(l.toks) + len(r.toks)
                                  - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                             / len(list_distinct(l.toks || r.toks)), 6) AS s
                FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
                WHERE CAST(len(l.toks) + len(r.toks) - len(list_distinct(l.toks || r.toks)) AS DOUBLE)
                      / len(list_distinct(l.toks || r.toks)) >= 0.8
            ),
            sym AS (
                SELECT a AS src, b AS dst, s FROM pairs
                UNION ALL
                SELECT b AS src, a AS dst, s FROM pairs
            ),
            rk AS (
                SELECT src, dst,
                       row_number() OVER (
                           PARTITION BY src ORDER BY s DESC, dst ASC
                       ) AS rn
                FROM sym
            ),
            votes AS (
                SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                       COUNT(*) AS v
                FROM rk WHERE rn <= 3 GROUP BY 1, 2
            )
            SELECT p.a AS doc_a, p.b AS doc_b, p.s AS jaccard
            FROM pairs p JOIN votes v ON v.a = p.a AND v.b = p.b
            WHERE v.v >= 2
            ORDER BY doc_a, doc_b
        """,
        # Symmetric Monge–Elkan over the same first-sorted-token blocked
        # pairs as the FS entries: nested-lambda twin of
        # scoring.monge_elkan_col (see _me_sql — exact micro-unit sums,
        # identical double op order in the final means).
        "parts_monge_elkan": f"""
            WITH t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            pr0 AS (
                SELECT l.pk AS pk_l, r.pk AS pk_r, l.dt AS ldt, r.dt AS rdt
                FROM f l JOIN f r
                  ON list_sort(l.dt)[1] = list_sort(r.dt)[1] AND l.pk < r.pk
            )
            SELECT CAST(pk_l AS BIGINT) AS pk_l, CAST(pk_r AS BIGINT) AS pk_r,
                   round(({_me_sql('ldt', 'rdt')} + {_me_sql('rdt', 'ldt')})
                         / CAST(2.0 AS DOUBLE), 6) AS monge_elkan
            FROM pr0
            ORDER BY pk_l, pk_r
        """,
        # Soft TF-IDF (Cohen-Ravikumar-Fienberg '03) over the same blocked
        # pairs: smooth token IDF (9dp) -> decimal-accumulated L2 norms ->
        # 9dp weights -> per-token best-alignment contributions in exact
        # nano-units (see _stf_dir_sql) -> symmetrized in one double op
        # order. theta = 0.9.
        "parts_soft_tfidf": f"""
            WITH t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
            tok AS (SELECT pk, unnest(dt) AS tkn FROM f),
            idf AS (
                SELECT tkn,
                       round(ln((CAST(1.0 AS DOUBLE) + nn.n)
                                / (CAST(1.0 AS DOUBLE) + COUNT(*)))
                             + CAST(1.0 AS DOUBLE), 9) AS idf
                FROM tok CROSS JOIN nn GROUP BY tkn, nn.n
            ),
            ssq AS (
                SELECT pk, SUM(CAST(round(i.idf * i.idf, 9)
                                    AS DECIMAL(38,9))) AS ssq
                FROM tok JOIN idf i USING (tkn) GROUP BY pk
            ),
            w AS (
                SELECT tok.pk, tok.tkn,
                       round(i.idf / sqrt(CAST(s.ssq AS DOUBLE)), 9) AS w
                FROM tok JOIN idf i USING (tkn) JOIN ssq s USING (pk)
            ),
            wa AS (
                SELECT pk, array_agg(struct_pack(t := tkn, w := w)
                                     ORDER BY tkn) AS tw
                FROM w GROUP BY pk
            ),
            pr0 AS (
                SELECT l.pk AS pk_l, r.pk AS pk_r,
                       wl.tw AS ltw, wr.tw AS rtw
                FROM f l JOIN f r
                  ON list_sort(l.dt)[1] = list_sort(r.dt)[1] AND l.pk < r.pk
                JOIN wa wl ON wl.pk = l.pk
                JOIN wa wr ON wr.pk = r.pk
            )
            SELECT CAST(pk_l AS BIGINT) AS pk_l, CAST(pk_r AS BIGINT) AS pk_r,
                   round(CAST({_stf_dir_sql('ltw', 'rtw')}
                              + {_stf_dir_sql('rtw', 'ltw')} AS DOUBLE)
                         / 1000000000.0 / 2.0, 6) AS soft_tfidf
            FROM pr0
            ORDER BY pk_l, pk_r
        """,
        # IDF-weighted token Jaccard over the same blocked pairs: 9dp
        # token IDF -> exact nano-units; intersection by membership,
        # union by inclusion-exclusion on per-name totals (distinct token
        # sets); ONE double division at the end.
        "parts_weighted_jaccard": f"""
            WITH t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
            tok AS (SELECT pk, unnest(dt) AS tkn FROM f),
            idf AS (
                SELECT tkn,
                       round(ln((CAST(1.0 AS DOUBLE) + nn.n)
                                / (CAST(1.0 AS DOUBLE) + COUNT(*)))
                             + CAST(1.0 AS DOUBLE), 9) AS idf
                FROM tok CROSS JOIN nn GROUP BY tkn, nn.n
            ),
            u AS (
                SELECT tok.pk, tok.tkn,
                       CAST(round(i.idf * 1000000000.0, 0) AS BIGINT) AS un
                FROM tok JOIN idf i USING (tkn)
            ),
            wa AS (
                SELECT pk,
                       array_agg(struct_pack(t := tkn, u := un)
                                 ORDER BY tkn) AS tw,
                       CAST(SUM(un) AS BIGINT) AS tot
                FROM u GROUP BY pk
            ),
            pr0 AS (
                SELECT l.pk AS pk_l, r.pk AS pk_r,
                       wl.tw AS ltw, wr.tw AS rtw,
                       wl.tot AS ltot, wr.tot AS rtot
                FROM f l JOIN f r
                  ON list_sort(l.dt)[1] = list_sort(r.dt)[1] AND l.pk < r.pk
                JOIN wa wl ON wl.pk = l.pk
                JOIN wa wr ON wr.pk = r.pk
            ),
            iu AS (
                SELECT pk_l, pk_r, ltot, rtot,
                       CAST(list_aggregate(list_transform(ltw, a ->
                           CASE WHEN len(list_filter(rtw, b -> b.t = a.t)) > 0
                                THEN a.u ELSE CAST(0 AS BIGINT) END),
                           'sum') AS BIGINT) AS inter_u
                FROM pr0
            )
            SELECT CAST(pk_l AS BIGINT) AS pk_l, CAST(pk_r AS BIGINT) AS pk_r,
                   round(CAST(inter_u AS DOUBLE)
                         / CAST(ltot + rtot - inter_u AS DOUBLE), 6)
                     AS weighted_jaccard
            FROM iu
            ORDER BY pk_l, pk_r
        """,
        # Fellegi–Sunter over first-sorted-token blocks: every agreement
        # band is integer cross-multiplied, every weight the IDENTICAL
        # 6dp decimal literal the engine embeds (generated above from the
        # same FSConfig), so the decimal sum is bit-equal by construction.
        "fs_match_parts": f"""
            WITH {_fs_levels_ctes()},
            w AS (
                SELECT *, CAST({_fs_weight_sql()} AS DOUBLE) AS fs_weight
                FROM pr
            )
            SELECT CAST(pk_l AS BIGINT) AS pk_l, CAST(pk_r AS BIGINT) AS pk_r,
                   key_exact, jaccard_band, first_token, len_band, fs_weight,
                   CASE WHEN fs_weight >= 10.0 THEN 'match'
                        WHEN fs_weight >= 0.0 THEN 'possible'
                        ELSE 'nonmatch' END AS decision
            FROM w ORDER BY pk_l, pk_r
        """,
        # estimate_u's deterministic shifted pairing: row i × rows i+1..i+3
        # cyclically in p_partkey order — the exact modulo join the engine
        # runs, replayed with generate_series.
        "fs_u_probs_parts": f"""
            WITH t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            f AS (
                SELECT pk, mk,
                       list_distinct(regexp_split_to_array(mk, '\\s+')) AS dt
                FROM t WHERE mk <> ''
            ),
            rn AS (
                SELECT pk, mk, dt,
                       ROW_NUMBER() OVER (ORDER BY pk) - 1 AS rn
                FROM f
            ),
            nn AS (SELECT COUNT(*) AS n FROM rn),
            pairs AS (
                SELECT l.mk AS lmk, r.mk AS rmk, l.dt AS ldt, r.dt AS rdt
                FROM rn l
                CROSS JOIN nn
                CROSS JOIN generate_series(1, 3) AS s(shift)
                JOIN rn r ON ((l.rn + s.shift) % nn.n) = r.rn
            ),
            lv AS (
                SELECT CAST(lmk = rmk AS INT) AS key_exact,
                       CAST(CASE WHEN 5 * (len(ldt) + len(rdt)
                                   - len(list_distinct(ldt || rdt)))
                                 >= 4 * len(list_distinct(ldt || rdt)) THEN 2
                                 WHEN 2 * (len(ldt) + len(rdt)
                                   - len(list_distinct(ldt || rdt)))
                                 >= len(list_distinct(ldt || rdt)) THEN 1
                                 ELSE 0 END AS INT) AS jaccard_band,
                       CAST(list_sort(ldt)[1] = list_sort(rdt)[1] AS INT)
                         AS first_token,
                       CAST(abs(length(lmk) - length(rmk)) <= 2 AS INT)
                         AS len_band
                FROM pairs
            ),
            stacked AS (
                SELECT 'key_exact' AS field, key_exact AS level FROM lv
                UNION ALL
                SELECT 'jaccard_band', jaccard_band FROM lv
                UNION ALL
                SELECT 'first_token', first_token FROM lv
                UNION ALL
                SELECT 'len_band', len_band FROM lv
            )
            SELECT field, CAST(level AS INT) AS level,
                   round(CAST(COUNT(*) AS DOUBLE)
                         / (SELECT n * 3 FROM nn), 6) AS u,
                   COUNT(*) AS n_pairs
            FROM stacked GROUP BY field, level ORDER BY field, level
        """,
        # EM fitting of m/u/λ: two chained-CTE rounds generated from the
        # same FSConfig + field order the engine iterates.
        "fs_em_mu_parts": _fs_em_sql(iterations=2),
        # B-cubed via the (pred, gold) contingency factoring — per-cell
        # 9dp-rounded double contributions summed as DECIMAL(38,9), means
        # rounded 6dp, F1 from the already-rounded means (same steps, same
        # order as clustering.bcubed).
        "er_bcubed_parts": f"""
            WITH a AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS pred,
                       p_brand AS gold
                FROM part
                WHERE {clean_name_sql('p_name')} <> ''
            ),
            cells AS (
                SELECT pred, gold, COUNT(*) AS c FROM a GROUP BY pred, gold
            ),
            ps AS (SELECT pred, SUM(c) AS np FROM cells GROUP BY pred),
            gs AS (SELECT gold, SUM(c) AS ng FROM cells GROUP BY gold),
            con AS (
                SELECT c.c,
                       CAST(round(CAST(c.c * c.c AS DOUBLE) / ps.np, 9)
                            AS DECIMAL(38,9)) AS pc,
                       CAST(round(CAST(c.c * c.c AS DOUBLE) / gs.ng, 9)
                            AS DECIMAL(38,9)) AS rc
                FROM cells c JOIN ps USING (pred) JOIN gs USING (gold)
            ),
            agg AS (
                SELECT CAST(SUM(c) AS BIGINT) AS n_records,
                       round(CAST(SUM(pc) AS DOUBLE) / SUM(c), 6)
                         AS bcubed_precision,
                       round(CAST(SUM(rc) AS DOUBLE) / SUM(c), 6)
                         AS bcubed_recall
                FROM con
            )
            SELECT n_records, bcubed_precision, bcubed_recall,
                   round(2.0 * bcubed_precision * bcubed_recall
                         / (bcubed_precision + bcubed_recall), 6) AS bcubed_f1
            FROM agg
        """,
        # Meta-blocking WNP: CBS weights from the quadratic block graph,
        # pruning by exact integer node means (w·cnt ≥ sum) — the engine's
        # rule verbatim.
        "parts_metablocking": f"""
            WITH {_metablock_ctes()}
            SELECT CAST(a AS BIGINT) AS pk_l, CAST(b AS BIGINT) AS pk_r,
                   w AS weight
            FROM kept
            ORDER BY pk_l, pk_r
        """,
        # Blocking-evaluation metrics of the WNP-kept graph vs exact-name
        # truth: exact integer counts, identical double op order for the
        # three ratios.
        "blocking_quality_parts": f"""
            WITH {_metablock_ctes()},
            lab AS (SELECT pk AS id, mk AS g FROM f),
            tg AS (
                SELECT CAST(l1.g = l2.g AS BIGINT) AS is_true
                FROM kept k
                JOIN lab l1 ON l1.id = k.a
                JOIN lab l2 ON l2.id = k.b
            ),
            cs AS (
                SELECT COUNT(*) AS n_candidates,
                       CAST(SUM(is_true) AS BIGINT) AS true_in_candidates
                FROM tg
            ),
            gs AS (
                SELECT CAST(SUM(CAST(sz * (sz - 1) / 2 AS BIGINT)) AS BIGINT)
                         AS n_true_pairs,
                       CAST(SUM(sz) AS BIGINT) AS n
                FROM (SELECT COUNT(*) AS sz FROM lab GROUP BY g) z
            )
            SELECT n_candidates, n_true_pairs, true_in_candidates,
                   round(CAST(true_in_candidates AS DOUBLE)
                         / CAST(n_true_pairs AS DOUBLE), 6)
                     AS pair_completeness,
                   round(CAST(true_in_candidates AS DOUBLE)
                         / CAST(n_candidates AS DOUBLE), 6) AS pair_quality,
                   round(CAST(1.0 AS DOUBLE)
                         - CAST(n_candidates AS DOUBLE)
                           / (CAST(n AS DOUBLE)
                              * (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))
                              / CAST(2.0 AS DOUBLE)), 6) AS reduction_ratio
            FROM cs CROSS JOIN gs
        """,
        # Sorted-neighborhood blocking: the identical (key, pk) total
        # order as one ROW_NUMBER, pairs within rank distance < 5.
        "parts_sorted_neighborhood": f"""
            WITH t AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS mk
                FROM part
            ),
            k AS (
                SELECT pk,
                       array_to_string(
                           list_sort(regexp_split_to_array(mk, '\\s+')), ''
                       ) AS key
                FROM t WHERE mk <> ''
            ),
            rn AS (
                SELECT pk, ROW_NUMBER() OVER (ORDER BY key, pk) AS rn FROM k
            )
            SELECT CAST(LEAST(l.pk, r.pk) AS BIGINT) AS pk_l,
                   CAST(GREATEST(l.pk, r.pk) AS BIGINT) AS pk_r
            FROM rn l JOIN rn r ON r.rn - l.rn BETWEEN 1 AND 4
            ORDER BY pk_l, pk_r
        """,
        # Rand / Adjusted Rand via the same contingency cells as B-cubed:
        # exact integer pair counts, double ratios in the engine's op
        # order (casts BEFORE the s_a·s_b product — int64 overflows at
        # web scale).
        "er_ari_parts": f"""
            WITH a AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS pred,
                       p_brand AS gold
                FROM part
                WHERE {clean_name_sql('p_name')} <> ''
            ),
            cells AS (
                SELECT pred, gold, COUNT(*) AS c FROM a GROUP BY pred, gold
            ),
            sij AS (
                SELECT CAST(SUM(CAST(c * (c - 1) / 2 AS BIGINT)) AS BIGINT)
                         AS s_ij,
                       CAST(SUM(c) AS BIGINT) AS n
                FROM cells
            ),
            sa AS (
                SELECT CAST(SUM(CAST(aa * (aa - 1) / 2 AS BIGINT)) AS BIGINT)
                         AS s_a
                FROM (SELECT SUM(c) AS aa FROM cells GROUP BY pred) z
            ),
            sb AS (
                SELECT CAST(SUM(CAST(bb * (bb - 1) / 2 AS BIGINT)) AS BIGINT)
                         AS s_b
                FROM (SELECT SUM(c) AS bb FROM cells GROUP BY gold) z
            ),
            j AS (
                SELECT s_ij, n, s_a, s_b,
                       CAST(n * (n - 1) / 2 AS BIGINT) AS t
                FROM sij CROSS JOIN sa CROSS JOIN sb
            )
            SELECT n AS n_records,
                   round(CAST(1.0 AS DOUBLE)
                         - CAST(s_a + s_b - 2 * s_ij AS DOUBLE)
                           / CAST(t AS DOUBLE), 6) AS rand_index,
                   round((CAST(s_ij AS DOUBLE)
                          - (CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE))
                            / CAST(t AS DOUBLE))
                         / (CAST(s_a + s_b AS DOUBLE) / CAST(2.0 AS DOUBLE)
                            - (CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE))
                              / CAST(t AS DOUBLE)), 6) AS adjusted_rand
            FROM j
        """,
        # V-measure (Rosenberg & Hirschberg '07) on the same pred/gold
        # frame: every entropy term is a 9dp-rounded double accumulated as
        # DECIMAL(38,9) (order-independent; absorbs last-ulp ln()
        # differences), ratios and harmonic mean replayed op-for-op —
        # the exact twin of clustering.vmeasure.
        "er_vmeasure_parts": f"""
            WITH a AS (
                SELECT p_partkey AS pk, {clean_name_sql('p_name')} AS pred,
                       p_brand AS gold
                FROM part
                WHERE {clean_name_sql('p_name')} <> ''
            ),
            cells AS (
                SELECT pred, gold, COUNT(*) AS c FROM a GROUP BY pred, gold
            ),
            psz AS (SELECT pred, SUM(c) AS np FROM cells GROUP BY pred),
            gsz AS (SELECT gold, SUM(c) AS ng FROM cells GROUP BY gold),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
            sck AS (
                SELECT COALESCE(SUM(CAST(round(
                           (CAST(cl.c AS DOUBLE) / t.n)
                           * ln(CAST(cl.c AS DOUBLE) / p.np), 9)
                       AS DECIMAL(38,9))), CAST(0 AS DECIMAL(38,9))) AS s_ck
                FROM cells cl JOIN psz p USING (pred) CROSS JOIN tot t
            ),
            sc AS (
                SELECT COALESCE(SUM(CAST(round(
                           (CAST(g.ng AS DOUBLE) / t.n)
                           * ln(CAST(g.ng AS DOUBLE) / t.n), 9)
                       AS DECIMAL(38,9))), CAST(0 AS DECIMAL(38,9))) AS s_c
                FROM gsz g CROSS JOIN tot t
            ),
            skc AS (
                SELECT COALESCE(SUM(CAST(round(
                           (CAST(cl.c AS DOUBLE) / t.n)
                           * ln(CAST(cl.c AS DOUBLE) / g.ng), 9)
                       AS DECIMAL(38,9))), CAST(0 AS DECIMAL(38,9))) AS s_kc
                FROM cells cl JOIN gsz g USING (gold) CROSS JOIN tot t
            ),
            sk AS (
                SELECT COALESCE(SUM(CAST(round(
                           (CAST(p.np AS DOUBLE) / t.n)
                           * ln(CAST(p.np AS DOUBLE) / t.n), 9)
                       AS DECIMAL(38,9))), CAST(0 AS DECIMAL(38,9))) AS s_k
                FROM psz p CROSS JOIN tot t
            ),
            hcv AS (
                SELECT t.n AS n_records,
                       CASE WHEN s_c = 0 THEN CAST(1.0 AS DOUBLE)
                            ELSE round(CAST(1.0 AS DOUBLE)
                                       - CAST(s_ck AS DOUBLE)
                                         / CAST(s_c AS DOUBLE), 6)
                       END AS homogeneity,
                       CASE WHEN s_k = 0 THEN CAST(1.0 AS DOUBLE)
                            ELSE round(CAST(1.0 AS DOUBLE)
                                       - CAST(s_kc AS DOUBLE)
                                         / CAST(s_k AS DOUBLE), 6)
                       END AS completeness
                FROM tot t CROSS JOIN sck CROSS JOIN sc
                     CROSS JOIN skc CROSS JOIN sk
            )
            SELECT n_records, homogeneity, completeness,
                   CASE WHEN homogeneity + completeness = 0.0
                        THEN CAST(0.0 AS DOUBLE)
                        ELSE round(CAST(2.0 AS DOUBLE) * homogeneity
                                   * completeness
                                   / (homogeneity + completeness), 6)
                   END AS v_measure
            FROM hcv
        """,
    }
