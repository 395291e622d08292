"""DuckDB oracle SQL — one entry per query in ``pig_spark.queries``.

The driver runs these side-by-side with the Spark DataFrames and
hash-compares values, so every aliased column here matches the Spark
output name, and float-sensitive aggregates follow the same
determinism policy (decimal-exact sums cast to double; round(…,6) for
similarity ratios).

Hash-parameterized oracles (minhash / simhash / LSH / lang-id /
quality) are GENERATED from the same module constants the Spark
implementations use (pig_spark.functions.dedup / similarity / text) —
single source of truth, so a constant change cannot desync the check.

Every query is oracle-checked as of r3. The last rows-only entry,
q78_sketch_uniques, gained a deterministic boundedness twin: the query
outputs (scope, within_bound) where within_bound = |HLL estimate −
exact| / exact < 5%, and the oracle predicts `true` for every scope —
an out-of-bound sketch hash-mismatches. q19 (rank) and q32 (sample)
gained checkable twins in r2: rank-after-ORDER and deterministic
hash-sample.
"""

from __future__ import annotations

from .functions import dedup, similarity, text

_DEC = "DECIMAL(18,2)"


def _dsum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS {_DEC})) AS DOUBLE)"


def _davg(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS {_DEC})) AS DOUBLE) / COUNT({col})"


_DISC_PRICE = f"CAST(l_extendedprice AS {_DEC}) * (CAST(1 AS {_DEC}) - CAST(l_discount AS {_DEC}))"

# ----------------------------------------------------------------------
# shared text fragments (must mirror pig_spark.functions.text exactly)
# ----------------------------------------------------------------------


def _toks(expr: str) -> str:
    """tokenize_ws: split on whitespace, drop empties."""
    return f"list_filter(string_split_regex(trim({expr}), '\\s+'), x -> x <> '')"


def _shingles(expr: str, n: int = dedup.SHINGLE_N) -> str:
    """word_shingles: distinct word n-grams of lower(text)."""
    t = _toks(f"lower({expr})")
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({t}) - {n - 1}, 1)), "
        f"i -> array_to_string(({t})[i:i+{n - 1}], ' ')))"
    )


def _h32(expr: str) -> str:
    """md5_32: first 8 md5 hex chars as unsigned 32-bit int."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def _h60(expr: str) -> str:
    """md5_60: first 15 md5 hex chars as unsigned 60-bit int (gram join
    keys — mirrors pig_spark.functions.dedup.md5_60)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _pii_redact_sql(expr: str) -> str:
    """Mirror text.redact: chained global regexp_replace, same order."""
    out = expr
    for _name, pat, token in text.PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def _rep_grams(n: int) -> str:
    """text._grams: NON-distinct sliding word n-grams (repetition needs
    multiplicity); empty when the doc has fewer than n tokens."""
    return (
        f"list_transform(generate_series(1, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' '))"
    )


def _minhash_sig_select() -> str:
    """mh0..mh{K-1} columns over an `h` hashed-shingle-list column
    (pure BIGINT arithmetic: a,b < 2^30, h < 2^32 — no overflow)."""
    cols = []
    for i in range(dedup.MINHASH_K):
        a, b = dedup.MINHASH_A[i], dedup.MINHASH_B[i]
        cols.append(f"list_min(list_transform(h, x -> (x * {a} + {b}) % {dedup.MINHASH_PRIME})) AS mh{i}")
    return ",\n       ".join(cols)


def _band_rows() -> str:
    rows = dedup.MINHASH_K // dedup.MINHASH_BANDS
    parts = []
    for b in range(dedup.MINHASH_BANDS):
        concat = " || ',' || ".join(f"CAST(mh{b * rows + j} AS VARCHAR)" for j in range(rows))
        parts.append(f"SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sigs")
    return "\nUNION ALL\n".join(parts)


def _vec_sql(vec: list[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]"


_QUERY_VEC = [((i * 37) % 13 - 6) / 13.0 for i in range(similarity.EMB_DIM)]


def _lang_case() -> str:
    score_cols = ", ".join(
        f"len(list_filter(toks, x -> list_contains({_sw_list(lang)}, lower(x)))) AS s_{lang}"
        for lang in text.LANG_ORDER
    )
    gm = "greatest(" + ", ".join(f"s_{lang}" for lang in text.LANG_ORDER) + ")"
    whens = "\n       ".join(f"WHEN s_{lang} = {gm} THEN '{lang}'" for lang in text.LANG_ORDER)
    return score_cols, f"CASE WHEN {gm} = 0 THEN 'und'\n       {whens} END"


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang]) + "]"


def _simhash_expr() -> str:
    """Mirror dedup.simhash: 32-bit signature from token-hash bit votes."""
    h = _h32("t")
    bits = []
    for b in range(dedup.SIMHASH_BITS):
        s = f"list_sum(list_transform(toks, t -> CASE WHEN ({h} >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        bits.append(f"(CASE WHEN {s} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(bits)


def _substr_ctes() -> str:
    """Shared q137/q138 oracle prefix — mirrors queries._substr_dup_windows."""
    return """
            WITH d AS (SELECT doc_id,
                              CASE WHEN doc_id % 3 = 0
                                   THEN '{boiler} ' || text ELSE text END AS text
                       FROM documents),
                 toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(trim(text), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM d),
                 staged AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM toks),
                 wins AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                                 CAST(('0x' || substr(md5(array_to_string(
                                     tk[CAST(i + 1 AS INT):CAST(i + {W} AS INT)], ' ')), 1, 15)) AS BIGINT) AS h
                          FROM staged, UNNEST(range(0, greatest(len(tk) - {W} + 1, 0))) AS t(i)),
                 firsts AS (SELECT h, MIN(doc_id * 1048576 + pos) AS fkey
                            FROM wins GROUP BY h),
                 dups AS (SELECT w.doc_id, w.pos
                          FROM wins w JOIN firsts f ON w.h = f.h
                          WHERE w.doc_id * 1048576 + w.pos <> f.fkey),""".format(
        boiler=_q137_boiler(), W=_q137_w()
    )


def _q141_suffix() -> str:
    from .queries import _FUZZY_CLONE_SUFFIX

    return _FUZZY_CLONE_SUFFIX


def _q137_boiler() -> str:
    """q137's injected boilerplate — imported from queries at call
    time (lazy: queries imports nothing from this module, but keep the
    module graph acyclic at import time)."""
    from .queries import _SUBSTR_BOILER

    return _SUBSTR_BOILER


def _q137_w() -> int:
    from .queries import _SUBSTR_W

    return _SUBSTR_W


def _pq_query_sql() -> str:
    """q152's fixed ADC query vector — the same LCG stream the Spark
    side draws (similarity._lcg_floats(4242, 64)), inlined as a
    DuckDB list literal."""
    return _vec_sql(similarity._lcg_floats(4242, similarity.EMB_DIM))


def _bigram_lm_ctes() -> str:
    """The bigram-LM scoring CTE chain shared by q130 (scores+keep)
    and q142 (tercile partition) — mirrors queries.q130 exactly:
    top-4096 unigram table, top-8192 bigram-conditional table,
    interpolated 0.7/0.3 backoff, 1e-9 OOV floor."""
    return """
            toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 flat AS (SELECT u.t FROM toks, unnest(toks.tk) AS u(t)),
                 cnt AS (SELECT t, COUNT(*) AS c FROM flat GROUP BY t),
                 tot AS (SELECT SUM(c) AS n FROM cnt),
                 uvocab AS (SELECT t, ln(c / tot.n) AS lp FROM cnt, tot
                            ORDER BY c DESC, t ASC LIMIT 4096),
                 gd AS (SELECT doc_id, len(tk) AS n_tokens,
                               CASE WHEN len(tk) >= 2
                                    THEN list_transform(generate_series(1, len(tk) - 1),
                                         i -> struct_pack(g := tk[i] || ' ' || tk[i+1],
                                                          w2 := tk[i+1]))
                                    ELSE CAST([] AS STRUCT(g VARCHAR, w2 VARCHAR)[]) END AS gs
                        FROM toks),
                 pairs AS (SELECT doc_id, u.s.g AS g, u.s.w2 AS w2
                           FROM gd, unnest(gd.gs) AS u(s)),
                 bcnt AS (SELECT g, COUNT(*) AS c2 FROM pairs GROUP BY g),
                 btop AS (SELECT g, c2, string_split(g, ' ')[1] AS w1 FROM bcnt
                          ORDER BY c2 DESC, g ASC LIMIT 8192),
                 bvocab AS (SELECT b.g, ln(b.c2 / c.c) AS lp
                            FROM btop b JOIN cnt c ON c.t = b.w1),
                 ps AS (SELECT p.doc_id,
                               ln(0.7 * COALESCE(exp(bv.lp), 0.0)
                                  + 0.3 * COALESCE(exp(uv.lp), 0.000000001)) AS lp
                        FROM pairs p LEFT JOIN bvocab bv ON p.g = bv.g
                                     LEFT JOIN uvocab uv ON p.w2 = uv.t),
                 agg AS (SELECT doc_id, AVG(lp) AS al FROM ps GROUP BY doc_id)"""


def _seq_ctes() -> str:
    """Shared CTE chain for the q158/q159 sequence-assembly family:
    token counts → exclusive corpus offset (by doc_id) → one span per
    crossed L=512 sequence — all integer math, mirroring
    operators/packing.sequence_spans exactly."""
    return f"""
            WITH t AS (SELECT doc_id,
                              CAST(len({_toks('text')}) AS BIGINT) AS n
                       FROM documents),
                 o AS (SELECT doc_id, n,
                              COALESCE(SUM(n) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS off
                       FROM t WHERE n > 0),
                 s AS (SELECT doc_id, n, off,
                              unnest(generate_series(CAST(off // 512 AS BIGINT),
                                  CAST((off + n - 1) // 512 AS BIGINT))) AS seq_id
                       FROM o),
                 spans AS (SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                                  CAST(greatest(off, seq_id * 512) - off
                                       AS BIGINT) AS start_in_doc,
                                  CAST(greatest(off, seq_id * 512) - seq_id * 512
                                       AS BIGINT) AS start_in_seq,
                                  CAST(least(off + n, seq_id * 512 + 512)
                                       - greatest(off, seq_id * 512)
                                       AS BIGINT) AS span_len
                           FROM s)"""


_SEQ_CTES = _seq_ctes()


def _bpe_seg_ctes(n_merges: int = 6) -> str:
    """q161's training replay, GENERATED: BPE merge learning is
    inherently sequential (step t counts pairs over step t-1's
    segmentation), so the oracle unrolls the same ``n_merges`` steps
    the engine's train_bpe runs — each an exact pair-count argmax
    with the identical (cnt DESC, a ASC, b ASC) tie-break, then the
    greedy left-to-right merge as a ``list_reduce`` over a
    string-encoded accumulator (symbols space-joined; whitespace
    tokenization guarantees no symbol contains the separator). The
    fold reproduces ml._merge_pair's semantics exactly, including
    the deferred-prev rule: after a merge the accumulator's last
    symbol is a||b, which can never equal a again (b nonempty), so a
    freshly merged symbol never immediately re-merges — the
    'aaa' + (a,a) -> [aa, a] reference case."""
    parts = [
        f"toks AS (SELECT doc_id, {_toks('lower(text)')} AS tk FROM documents)",
        "words AS (SELECT doc_id, g.i AS pos, tk[g.i] AS w "
        "FROM toks, unnest(generate_series(1, len(tk))) AS g(i))",
        "wt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w)",
        "seg0 AS (SELECT w, c, string_split(w, '') AS seg FROM wt)",
    ]
    for s in range(1, n_merges + 1):
        prev = f"seg{s - 1}"
        parts.append(
            f"p{s} AS (SELECT u.s.a AS a, u.s.b AS b, SUM(c) AS cnt "
            f"FROM (SELECT c, list_transform(range(1, len(seg)), "
            f"i -> struct_pack(a := seg[i], b := seg[i+1])) AS ps "
            f"FROM {prev} WHERE len(seg) >= 2) t, unnest(t.ps) AS u(s) "
            f"GROUP BY 1, 2)"
        )
        parts.append(
            f"m{s} AS (SELECT a, b FROM p{s} "
            f"ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"seg{s} AS (SELECT w, c, CASE WHEN len(seg) <= 1 THEN seg "
            f"ELSE string_split(list_reduce(seg, (acc, x) -> CASE "
            f"WHEN string_split(acc, ' ')[-1] = m{s}.a AND x = m{s}.b "
            f"THEN left(acc, length(acc) - length(m{s}.a)) || m{s}.a || m{s}.b "
            f"ELSE acc || ' ' || x END), ' ') END AS seg FROM {prev}, m{s})"
        )
    return "WITH " + ",\n ".join(parts)


def _kcenter_sql(k: int) -> str:
    """q156's DuckDB twin, GENERATED: greedy k-center is inherently
    sequential (step t depends on every prior pick), so the oracle
    unrolls the same k selection steps the engine runs — each a
    max-min-distance argmax with the identical (md DESC, vec_id ASC)
    tie-break, over the identical left-to-right list_sum fold, so the
    doubles and the winners match bit-for-bit."""

    def d2(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {similarity.EMB_DIM + 1}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT 1)",
        f"d0 AS (SELECT e.vec_id, e.v, {d2('e.v', 'c0.v')} AS md FROM e, c0)",
    ]
    for t in range(1, k):
        parts.append(
            f"c{t} AS (SELECT vec_id, v FROM d{t - 1} "
            f"ORDER BY md DESC, vec_id ASC LIMIT 1)"
        )
        if t < k - 1:
            parts.append(
                f"d{t} AS (SELECT d.vec_id, d.v, "
                f"least(d.md, {d2('d.v', f'c{t}.v')}) AS md "
                f"FROM d{t - 1} d, c{t})"
            )
    union = " UNION ALL ".join(f"SELECT vec_id, v FROM c{t}" for t in range(k))
    parts.append(f"cents AS ({union})")
    parts.append(
        "ranked AS (SELECT e.vec_id, c.vec_id AS cid, "
        f"{d2('e.v', 'c.v')} AS dd, "
        "ROW_NUMBER() OVER (PARTITION BY e.vec_id "
        f"ORDER BY {d2('e.v', 'c.v')} ASC, c.vec_id ASC) AS rn "
        "FROM e, cents c)"
    )
    return (
        "WITH " + ",\n ".join(parts) + "\n"
        "SELECT r.vec_id, CAST(r.cid AS BIGINT) AS center_id, "
        "round(r.dd, 6) AS dist, "
        "r.vec_id IN (SELECT vec_id FROM cents) AS is_center "
        "FROM ranked r WHERE r.rn = 1"
    )


def oracle_sql() -> dict[str, str]:
    rows = dedup.MINHASH_K // dedup.MINHASH_BANDS
    lang_scores, lang_case = _lang_case()
    qv = _vec_sql(_QUERY_VEC)
    qnorm = f"sqrt(list_dot_product({qv}, {qv}))"

    # LSH query bucket, computed from the same hyperplane constants
    qbits = [1 if sum(a * b for a, b in zip(_QUERY_VEC, plane)) > 0 else 0 for plane in similarity.HYPERPLANES]
    qbucket = sum(bit << p for p, bit in enumerate(qbits))
    probe_buckets = [qbucket, qbucket ^ 1]  # probes=2 in q46
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {_vec_sql(plane)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(similarity.HYPERPLANES)
    )

    # q45 banded-LSH pair buckets from the same per-band hyperplane
    # constants the Spark side uses (similarity.pair_hyperplanes)
    pair_band_selects = []
    for bi, planes in enumerate(similarity.pair_hyperplanes()):
        bexpr = " + ".join(
            f"(CASE WHEN list_dot_product(v, {_vec_sql(plane)}) > 0 THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(planes)
        )
        pair_band_selects.append(f"SELECT vec_id, v, n, {bi} AS band, {bexpr} AS bucket FROM vs")
    pair_bands_sql = "\nUNION ALL\n".join(pair_band_selects)

    # shared minhash-LSH pair pipeline (q41 result set; q87 closes it
    # transitively into components with a recursive min-label CTE).
    # minhash_tail runs over ANY upstream `docs(doc_id, sh)` CTE —
    # q132 reuses it over distinct PARAGRAPHS instead of documents.
    minhash_tail = f"""hashed AS (SELECT doc_id, sh, list_transform(sh, s -> {_h32('s')}) AS h FROM docs),
            sigs AS (SELECT doc_id, {_minhash_sig_select()} FROM hashed),
            bands AS ({_band_rows()}),
            cands AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
                GROUP BY 1, 2),
            verified AS (
                SELECT c.id_a, c.id_b,
                       round(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                             / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))), 6) AS jaccard
                FROM cands c JOIN docs a ON c.id_a = a.doc_id JOIN docs b ON c.id_b = b.doc_id)"""
    minhash_ctes = (
        f"docs AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents),\n            "
        + minhash_tail
    )
    # min-label transitive closure over the verified pair stream
    # (shared by q87/q91/q132)
    cc_ctes = """pairs2 AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.4),
            ed AS (SELECT id_a AS a, id_b AS b FROM pairs2
                   UNION SELECT id_b, id_a FROM pairs2),
            nd AS (SELECT DISTINCT a AS node FROM ed),
            reach(node, lbl) AS (
                SELECT node, node FROM nd
                UNION
                SELECT ed.b, r.lbl FROM reach r JOIN ed ON ed.a = r.node WHERE r.lbl < ed.b)"""

    quality = f"""
        WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
        m AS (SELECT doc_id,
                     CAST(len(toks) AS DOUBLE) AS n,
                     CAST(len(list_filter(toks, x -> list_contains({_sw_list('en')}, lower(x)))) AS DOUBLE) AS sw,
                     toks
              FROM t)
        SELECT doc_id,
               round(0.4 * least((CASE WHEN n > 0 THEN sw / n ELSE 0.0 END) / 0.2, 1.0)
                   + 0.3 * least(n / 50.0, 1.0)
                   + 0.3 * (1.0 - least(abs((CASE WHEN n > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / n ELSE 0.0 END) - 5.0) / 5.0, 1.0)), 6) AS q
        FROM m"""

    out = {
        "q01_group_agg": f"""
            SELECT l_returnflag, l_linestatus,
                   {_dsum('l_quantity')} AS sum_qty,
                   {_dsum('l_extendedprice')} AS sum_base_price,
                   CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
                   {_davg('l_quantity')} AS avg_qty,
                   {_davg('l_extendedprice')} AS avg_price,
                   {_davg('l_discount')} AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "q02_filter_project": f"""
            SELECT l_orderkey, l_linenumber,
                   CAST({_DISC_PRICE} * (CAST(1 AS {_DEC}) + CAST(l_tax AS {_DEC})) AS DOUBLE) AS charge,
                   CASE WHEN l_quantity > 45 THEN 'H' ELSE 'L' END AS heavy
            FROM lineitem WHERE l_quantity > 30 AND l_returnflag <> 'R'""",
        "q03_order_limit": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""",
        "q04_distinct": "SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
        "q05_join_inner": f"""
            SELECT c_mktsegment, COUNT(*) AS n_orders, {_dsum('o_totalprice')} AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "q06_join_left": f"""
            SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
                   COALESCE({_dsum('o_totalprice')}, 0.0) AS spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey""",
        "q07_join_full": """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_acctbal AS acctbal, o.n_orders
            FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 1000) c
            FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders WHERE o_custkey >= 800 GROUP BY o_custkey) o
            ON c.c_custkey = o.o_custkey""",
        "q08_join_replicated": f"""
            SELECT n_name, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name""",
        "q09_join_multiway": f"""
            SELECT o_orderkey, o_orderdate, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate""",
        "q10_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
        "q11_anti_join": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)""",
        "q12_cross": "SELECT r_name, n_name FROM region CROSS JOIN nation",
        "q13_union_onschema": """
            SELECT c_name, c_custkey AS key, c_acctbal AS bal, CAST(NULL AS VARCHAR) AS sname FROM customer
            UNION ALL
            SELECT CAST(NULL AS VARCHAR), s_suppkey, CAST(NULL AS DOUBLE), s_name FROM supplier""",
        "q14_union_positional": """
            SELECT l_orderkey, l_quantity FROM lineitem WHERE l_returnflag = 'R'
            UNION ALL
            SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity >= 49""",
        "q15_cogroup": """
            SELECT COALESCE(c.k, o.k) AS custkey, COALESCE(c.n, 0) AS n_cust, COALESCE(o.n, 0) AS n_orders
            FROM (SELECT c_custkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) c
            FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1) o ON c.k = o.k""",
        "q16_group_flatten": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey <= 1000""",
        "q17_rank_by": """
            SELECT rank() OVER (ORDER BY c_acctbal DESC NULLS LAST) AS rank, c_custkey, c_acctbal
            FROM customer""",
        "q18_rank_dense": """
            SELECT dense_rank() OVER (ORDER BY p_size ASC NULLS FIRST) AS drank, p_partkey, p_size
            FROM part""",
        "q19_rank_global": """
            SELECT row_number() OVER (ORDER BY n_name) AS r, n_nationkey, n_name
            FROM nation""",
        "q20_cube": f"""
            SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id,
                   {_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
        "q21_rollup": f"""
            SELECT o_orderstatus, o_orderpriority, CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_id,
                   {_dsum('o_totalprice')} AS total, COUNT(*) AS n
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
        "q22_split": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000",
        "q23_nested_topk": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
                SELECT l_orderkey, l_linenumber, l_extendedprice,
                       row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn
                FROM lineitem WHERE l_orderkey <= 2000) t
            WHERE rn <= 2""",
        "q24_scalar": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem) * 1.9""",
        "q25_case_in": """
            SELECT p_partkey,
                   CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
                   CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END AS pricey
            FROM part WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')""",
        "q26_regex_match": r"""
            SELECT p_partkey, p_type,
                   CASE WHEN regexp_matches(p_type, '^(\w+)') THEN regexp_extract(p_type, '^(\w+)', 1) ELSE NULL END AS first_word
            FROM part WHERE regexp_full_match(p_type, '.*O.*')""",
        "q27_string_funcs": """
            SELECT c_custkey,
                   upper(c_name) AS up,
                   lower(c_name) AS lo,
                   substr(c_name, 1, 8) AS sub,
                   CAST(strpos(c_name, '#') - 1 AS INTEGER) AS idx,
                   regexp_replace(c_name, 'Customer', 'Cust', 'g') AS rep,
                   c_name || '|' || c_mktsegment AS cat,
                   trim('  ' || c_mktsegment || '  ') AS tr
            FROM customer""",
        "q28_math_funcs": """
            SELECT l_orderkey, l_linenumber,
                   abs(l_quantity - 25) AS a,
                   CAST(ceil(l_discount * 100) AS BIGINT) AS c,
                   CAST(floor(l_tax * 100) AS BIGINT) AS fl,
                   CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS r,
                   round(l_quantity / 7.0, 2) AS r2,
                   round(sqrt(l_quantity), 6) AS s,
                   round(ln(l_extendedprice), 6) AS lg
            FROM lineitem WHERE l_orderkey <= 500""",
        "q29_datetime_funcs": """
            SELECT o_orderkey,
                   CAST(date_part('year', o_orderdate) AS INTEGER) AS y,
                   CAST(date_part('month', o_orderdate) AS INTEGER) AS m,
                   CAST(date_part('day', o_orderdate) AS INTEGER) AS d,
                   CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
                   o_orderdate + INTERVAL 1 MONTH AS plus_month,
                   CAST(floor((epoch(TIMESTAMP '1998-12-31 00:00:00') - epoch(o_orderdate)) / 86400) AS BIGINT) AS days_since
            FROM orders WHERE o_orderkey <= 2000""",
        "q30_group_null_keys": """
            SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk_null,
                   COUNT(*) AS n, COUNT(c_acctbal) AS n_nonnull_bal
            FROM customer GROUP BY 1""",
        "q31_json_map": """
            SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k, COUNT(*) AS n
            FROM events GROUP BY event_type""",
        "q32_sample": f"""
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE {_h32("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")} % 1000 < 100""",
        "q33_tokenize_wordcount": f"""
            SELECT u.word, COUNT(*) AS cnt
            FROM documents d, unnest({_toks('d.text')}) AS u(word)
            GROUP BY u.word""",
        "q34_assert": "SELECT * FROM region",
        "q35_intersect_except": """
            SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
        "q40_dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)""",
        "q41_minhash_pairs": f"""
            WITH {minhash_ctes}
            SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.4""",
        "q87_dedup_groups": f"""
            WITH RECURSIVE {minhash_ctes},
            pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.4),
            ed AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
            nd AS (SELECT DISTINCT a AS node FROM ed),
            reach(node, lbl) AS (
                SELECT node, node FROM nd
                UNION
                SELECT ed.b, r.lbl FROM reach r JOIN ed ON ed.a = r.node WHERE r.lbl < ed.b)
            SELECT node AS doc_id, MIN(lbl) AS group_id FROM reach GROUP BY node""",
        "q93_latin_corpus_pipeline": f"""
            WITH tk AS (SELECT doc_id, text, {_toks('text')} AS toks FROM documents),
            sco AS (SELECT doc_id, text, toks, {lang_scores} FROM tk),
            lng AS (SELECT doc_id, text, toks, {lang_case} AS lang FROM sco),
            met AS (SELECT doc_id, text, lang,
                           CAST(len(toks) AS DOUBLE) AS n,
                           CAST(len(list_filter(toks, x -> list_contains({_sw_list('en')}, lower(x)))) AS DOUBLE) AS sw,
                           toks FROM lng),
            scored AS (SELECT doc_id, text, lang,
                   round(0.4 * least((CASE WHEN n > 0 THEN sw / n ELSE 0.0 END) / 0.2, 1.0)
                       + 0.3 * least(n / 50.0, 1.0)
                       + 0.3 * (1.0 - least(abs((CASE WHEN n > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / n ELSE 0.0 END) - 5.0) / 5.0, 1.0)), 6) AS q
                   FROM met),
            base AS (SELECT doc_id,
                            md5(array_to_string(list_sort(list_distinct({_toks('lower(text)')})), ' ')) AS fp
                     FROM scored WHERE lang = 'en' AND q >= 0.5)
            SELECT fp, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups
            FROM base GROUP BY fp""",
        "q91_dedup_survivors": f"""
            WITH RECURSIVE {minhash_ctes},
            pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.4),
            ed AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
            nd AS (SELECT DISTINCT a AS node FROM ed),
            reach(node, lbl) AS (
                SELECT node, node FROM nd
                UNION
                SELECT ed.b, r.lbl FROM reach r JOIN ed ON ed.a = r.node WHERE r.lbl < ed.b),
            cc AS (SELECT node AS doc_id, MIN(lbl) AS group_id FROM reach GROUP BY node),
            m AS (SELECT cc.group_id, cc.doc_id,
                         row_number() OVER (PARTITION BY cc.group_id
                             ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rn
                  FROM cc JOIN documents d USING (doc_id))
            SELECT group_id, MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM m GROUP BY group_id""",
        "q92_gapfill": """
            WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
                              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
                       FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi FROM h GROUP BY 1),
            grid AS (SELECT b.event_type, u.h AS hour
                     FROM b, unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS u(h)),
            j AS (SELECT g.event_type, g.hour, h.n, h.total, (h.hour IS NULL) AS was_gap
                  FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.hour = h.hour)
            SELECT event_type, hour, CAST(COALESCE(n, 0) AS BIGINT) AS n,
                   last_value(total IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total,
                   was_gap
            FROM j""",
        "q88_contamination": f"""
            WITH bench AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents WHERE doc_id % 97 = 0),
            bg AS (SELECT DISTINCT {_h60('u.g')} AS gh FROM bench, unnest(bench.sh) AS u(g)),
            train AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents WHERE doc_id % 97 <> 0),
            sizes AS (SELECT doc_id, len(sh) AS n_grams FROM train),
            tg AS (SELECT doc_id, {_h60('u.g')} AS gh FROM train, unnest(train.sh) AS u(g)),
            hits AS (SELECT doc_id, COUNT(*) AS n_shared FROM tg WHERE gh IN (SELECT gh FROM bg) GROUP BY doc_id)
            SELECT doc_id, n_shared, n_grams, ratio, ratio >= 0.05 AS contaminated FROM (
                SELECT s.doc_id,
                       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
                       CAST(s.n_grams AS BIGINT) AS n_grams,
                       round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / greatest(s.n_grams, 1), 6) AS ratio
                FROM sizes s LEFT JOIN hits h USING (doc_id)) z""",
        "q102_contamination_bloom": f"""
            WITH bench AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents WHERE doc_id % 97 = 0),
            bg AS (SELECT DISTINCT {_h60('u.g')} AS gh FROM bench, unnest(bench.sh) AS u(g)),
            train AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents WHERE doc_id % 97 <> 0),
            sizes AS (SELECT doc_id, len(sh) AS n_grams FROM train),
            tg AS (SELECT doc_id, {_h60('u.g')} AS gh FROM train, unnest(train.sh) AS u(g)),
            hits AS (SELECT doc_id, COUNT(*) AS n_shared FROM tg WHERE gh IN (SELECT gh FROM bg) GROUP BY doc_id)
            SELECT doc_id, n_shared, n_grams, ratio, ratio >= 0.05 AS contaminated FROM (
                SELECT s.doc_id,
                       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
                       CAST(s.n_grams AS BIGINT) AS n_grams,
                       round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / greatest(s.n_grams, 1), 6) AS ratio
                FROM sizes s LEFT JOIN hits h USING (doc_id)) z""",
        "q94_doc_chunks": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            k AS (SELECT doc_id, words,
                         unnest(generate_series(0,
                             greatest(CAST(ceil((len(words) - 16) / 12.0) AS BIGINT), 0))) AS chunk_id
                  FROM w)
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(len(list_slice(words, chunk_id*12+1, chunk_id*12+16)) AS BIGINT) AS n_tokens,
                   md5(array_to_string(list_slice(words, chunk_id*12+1, chunk_id*12+16), ' ')) AS chunk_md5
            FROM k""",
        "q95_mixture_sample": f"""
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
            t AS (SELECT SUM(n) AS tot_n, SUM(pow(CAST(n AS DOUBLE), 0.5)) AS wsum FROM c),
            r AS (SELECT lang,
                         least(1.0, 0.2 * tot_n * (pow(CAST(n AS DOUBLE), 0.5) / wsum) / n) AS rate
                  FROM c, t)
            SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(d.doc_id) AS BIGINT) AS id_checksum
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE CAST({_h32("CAST(d.doc_id AS VARCHAR)")} AS DOUBLE) / 4294967296.0 < r.rate
            GROUP BY d.lang""",
        # q140: q125's scoring SQL + q95's rate machinery + per-lang
        # mean-weight normalization — every accept decision replayed
        # exactly (md5 fraction, exact 1.5/0.5 weights, IEEE rates)
        "q140_quality_mixture": f"""
            WITH d AS (SELECT doc_id, lang,
                              list_filter(string_split_regex(trim(text), '\\s+'),
                                          x -> x <> '') AS tk
                       FROM documents),
                 f AS (SELECT doc_id, lang,
                              list_concat(tk,
                                  CASE WHEN len(tk) >= 2
                                       THEN list_transform(generate_series(1, len(tk) - 1),
                                                           i -> tk[i] || ' ' || tk[i + 1])
                                       ELSE CAST([] AS VARCHAR[]) END) AS feats
                       FROM d),
                 s AS (SELECT doc_id, lang,
                              CASE WHEN len(feats) > 0 THEN
                                list_sum(list_transform(feats, x ->
                                  (((CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 4096)
                                    * 2654435761) % 4096) / 4096.0 - 0.5))
                                / len(feats)
                              END AS score
                       FROM f),
                 w AS (SELECT doc_id, lang, score,
                              CASE WHEN score > 0 THEN 1.5 ELSE 0.5 END AS wgt
                       FROM s),
                 c AS (SELECT lang, COUNT(*) AS n, AVG(wgt) AS avg_w FROM w GROUP BY lang),
                 t AS (SELECT SUM(n) AS tot_n, SUM(pow(CAST(n AS DOUBLE), 0.5)) AS wsum FROM c),
                 r AS (SELECT lang, 0.2 * tot_n * (pow(CAST(n AS DOUBLE), 0.5) / wsum) / n AS rate,
                              avg_w
                       FROM c, t),
                 k AS (SELECT w.lang, w.doc_id, w.score
                       FROM w JOIN r USING (lang)
                       WHERE CAST({_h32("CAST(w.doc_id AS VARCHAR)")} AS DOUBLE) / 4294967296.0
                             < least(1.0, r.rate * w.wgt / r.avg_w))
            SELECT lang, score > 0 AS hi_quality,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM k GROUP BY lang, score > 0""",
        "q96_split_assign": f"""
            WITH s AS (SELECT lang, doc_id,
                              CASE WHEN f < 0.90 THEN 'train'
                                   WHEN f < 0.95 THEN 'val'
                                   ELSE 'test' END AS split
                       FROM (SELECT lang, doc_id,
                                    CAST({_h32("CAST(doc_id AS VARCHAR)")} AS DOUBLE) / 4294967296.0 AS f
                             FROM documents) z)
            SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM s GROUP BY lang, split""",
        "q97_top_ngrams": f"""
            WITH t AS (SELECT lang, {_toks('lower(text)')} AS toks FROM documents),
            g AS (SELECT lang, u.x AS gram FROM t, unnest({_rep_grams(2)}) AS u(x)),
            c AS (SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY lang, gram),
            r AS (SELECT lang, gram, CAST(n AS BIGINT) AS n,
                         row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram ASC) AS rank
                  FROM c)
            SELECT lang, CAST(rank AS BIGINT) AS rank, gram, n FROM r WHERE rank <= 5""",
        "q98_latin_window_over": """
            WITH p AS (SELECT o_custkey, o_orderkey, o_orderdate,
                              CAST(floor(o_totalprice) AS BIGINT) AS cents
                       FROM orders)
            SELECT o_custkey, o_orderkey, o_orderdate, cents,
                   CAST(SUM(cents) OVER cum AS BIGINT) AS run_total,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(lag(cents) OVER w AS BIGINT) AS prev_cents,
                   CAST(MAX(cents) OVER (PARTITION BY o_custkey) AS BIGINT) AS max_cents
            FROM p
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
        "q99_piggybank_funcs": """
            SELECT p_partkey,
                   CASE WHEN length(p_name) > 2 THEN
                        substr(p_name, 1, 2) || '***' || substr(p_name, 6)
                   END AS stuffed,
                   CASE WHEN p_retailprice <= 950.0 THEN 'cheap'
                        WHEN p_retailprice <= 1500.0 THEN 'mid'
                        ELSE 'expensive' END AS price_bin,
                   CASE p_brand WHEN 'Brand#11' THEN 'first'
                                WHEN 'Brand#55' THEN 'last'
                                ELSE 'mid' END AS brand_dec,
                   round(atan2(p_retailprice, CAST(p_size AS DOUBLE)), 6) AS a2,
                   round(sqrt(CAST(p_size AS DOUBLE)*p_size + 9.0), 6) AS hy,
                   CAST(p_size AS DOUBLE) * 4.0 AS sc,
                   CAST(floor(log2(abs(p_retailprice))) AS INT) AS gexp,
                   reverse(p_name) AS rev,
                   CAST(length(p_name) AS INT) AS len,
                   (regexp_extract(p_brand, '#(\\d+)$', 1) SIMILAR TO '[+-]?[0-9]+'
                    AND TRY_CAST(regexp_extract(p_brand, '#(\\d+)$', 1) AS INT) IS NOT NULL) AS brand_is_int,
                   FALSE AS type_is_num,
                   replace(replace(p_brand, '#', '-'), 'Brand', 'B') AS rm
            FROM part""",
        "q100_incremental_dedup": f"""
            WITH {minhash_ctes},
            nb AS (SELECT doc_id, band, bh FROM bands WHERE doc_id % 10 = 0),
            cd AS (SELECT nb.doc_id AS new_id, b2.doc_id AS match_id
                   FROM nb JOIN bands b2 ON nb.band = b2.band AND nb.bh = b2.bh
                   WHERE nb.doc_id <> b2.doc_id
                   GROUP BY 1, 2)
            SELECT new_id, match_id,
                   round(({" + ".join(f"CAST(l.mh{i} = r.mh{i} AS INT)" for i in range(dedup.MINHASH_K))})
                         / {float(dedup.MINHASH_K)}, 6) AS est_jaccard
            FROM cd JOIN sigs l ON cd.new_id = l.doc_id
                    JOIN sigs r ON cd.match_id = r.doc_id
            WHERE round(({" + ".join(f"CAST(l.mh{i} = r.mh{i} AS INT)" for i in range(dedup.MINHASH_K))})
                        / {float(dedup.MINHASH_K)}, 6) >= 0.5""",
        # q141: q100's signature machinery across two corpora — the
        # synthesized corpus is (train ∪ eval-clones); eval side =
        # original %97 ids, train side = everything else
        "q141_fuzzy_decontamination": f"""
            WITH corpus AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT doc_id + 1000000 AS doc_id,
                                   text || ' {{suffix}}' AS text
                            FROM documents WHERE doc_id % 97 = 0),
                 docs AS (SELECT doc_id, {_shingles('text')} AS sh FROM corpus),
                 hashed AS (SELECT doc_id, sh, list_transform(sh, s -> {_h32('s')}) AS h FROM docs),
                 sigs AS (SELECT doc_id, {_minhash_sig_select()} FROM hashed),
                 bands AS ({_band_rows()}),
                 eb AS (SELECT doc_id, band, bh FROM bands
                        WHERE doc_id % 97 = 0 AND doc_id < 1000000),
                 tb AS (SELECT doc_id, band, bh FROM bands
                        WHERE NOT (doc_id % 97 = 0 AND doc_id < 1000000)),
                 cd AS (SELECT tb.doc_id AS train_id, eb.doc_id AS eval_id
                        FROM tb JOIN eb ON tb.band = eb.band AND tb.bh = eb.bh
                        GROUP BY 1, 2),
                 scored AS (
                    SELECT train_id, eval_id,
                           round(({" + ".join(f"CAST(l.mh{i} = r.mh{i} AS INT)" for i in range(dedup.MINHASH_K))})
                                 / {float(dedup.MINHASH_K)}, 6) AS est
                    FROM cd JOIN sigs l ON cd.train_id = l.doc_id
                            JOIN sigs r ON cd.eval_id = r.doc_id)
            SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
                   MAX(est) AS max_est
            FROM scored WHERE est >= 0.5
            GROUP BY train_id""".format(suffix=_q141_suffix()),
        "q101_latin_chunk_pipeline": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            k AS (SELECT doc_id, words,
                         unnest(generate_series(0,
                             greatest(CAST(ceil((len(words) - 16) / 12.0) AS BIGINT), 0))) AS chunk_id
                  FROM w),
            c AS (SELECT doc_id,
                         len(list_slice(words, chunk_id*12+1, chunk_id*12+16)) AS n_tokens
                  FROM k)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM c WHERE n_tokens >= 8 GROUP BY doc_id""",
        "q103_log_parse": r"""
            WITH l AS (
                SELECT event_id,
                       '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(user_id % 7 AS VARCHAR)
                       || ' - frank [01/Jan/2024:00:00:00 +0000] "' || upper(event_type)
                       || ' /e/' || CAST(event_id AS VARCHAR) || ' HTTP/1.1" '
                       || CAST(200 + event_id % 3 AS VARCHAR) || ' ' || CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR) AS line
                FROM events)
            SELECT event_id,
                   regexp_extract(line, '^(\S+)\s+(\S+)\s+(\S+)\s+.(\S+\s+\S+).\s+.(\S+)\s+(\S+)\s+(\S+.\S+).\s+(\S+)\s+(\S+)$', 1) AS remote_addr,
                   regexp_extract(line, '^(\S+)\s+(\S+)\s+(\S+)\s+.(\S+\s+\S+).\s+.(\S+)\s+(\S+)\s+(\S+.\S+).\s+(\S+)\s+(\S+)$', 5) AS method,
                   regexp_extract(line, '^(\S+)\s+(\S+)\s+(\S+)\s+.(\S+\s+\S+).\s+.(\S+)\s+(\S+)\s+(\S+.\S+).\s+(\S+)\s+(\S+)$', 6) AS uri,
                   CAST(regexp_extract(line, '^(\S+)\s+(\S+)\s+(\S+)\s+.(\S+\s+\S+).\s+.(\S+)\s+(\S+)\s+(\S+.\S+).\s+(\S+)\s+(\S+)$', 8) AS INT) AS status,
                   CAST(regexp_extract(line, '^(\S+)\s+(\S+)\s+(\S+)\s+.(\S+\s+\S+).\s+.(\S+)\s+(\S+)\s+(\S+.\S+).\s+(\S+)\s+(\S+)$', 9) AS BIGINT) AS bytes
            FROM l""",
        "q104_cohort_retention": """
            WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            coh AS (SELECT user_id, MIN(day) AS cohort_day FROM acts GROUP BY user_id)
            SELECT c.cohort_day, CAST(a.day - c.cohort_day AS BIGINT) AS offset_days,
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
            FROM acts a JOIN coh c USING (user_id)
            GROUP BY c.cohort_day, offset_days""",
        "q105_volume_anomaly": """
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            scored AS (
                SELECT event_type, day, n,
                       AVG(n) OVER w AS m,
                       stddev_samp(n) OVER w AS s,
                       COUNT(n) OVER w AS k
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
            SELECT event_type, day, n,
                   CASE WHEN k >= 3 AND s > 0 THEN round((n - m) / s, 6) END AS z,
                   COALESCE(abs(CASE WHEN k >= 3 AND s > 0 THEN round((n - m) / s, 6) END) >= 3.0, FALSE) AS anomalous
            FROM scored""",
        "q106_cms_frequencies": f"""
            WITH ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact FROM events GROUP BY user_id),
            top AS (SELECT user_id, exact FROM ex ORDER BY exact DESC, user_id ASC LIMIT 25),
            rb AS (SELECT {_h32("CAST(user_id AS VARCHAR) || '#' || CAST(u.d AS VARCHAR)")} % 512 AS bucket, u.d
                   FROM events, unnest([0,1,2,3]) AS u(d)),
            sk AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM rb GROUP BY d, bucket),
            probes AS (SELECT t.user_id, u.d,
                              {_h32("CAST(t.user_id AS VARCHAR) || '#' || CAST(u.d AS VARCHAR)")} % 512 AS bucket
                       FROM top t, unnest([0,1,2,3]) AS u(d)),
            est AS (SELECT p.user_id, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
                    FROM probes p LEFT JOIN sk ON p.d = sk.d AND p.bucket = sk.bucket
                    GROUP BY p.user_id)
            SELECT t.user_id, t.exact, e.est, e.est >= t.exact AS never_under
            FROM top t JOIN est e USING (user_id)""",
        "q111_domain_caps": """
            WITH u AS (SELECT doc_id,
                              'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS domain,
                              CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
                       FROM documents),
                 r AS (SELECT domain, doc_id, n_tokens,
                              row_number() OVER (PARTITION BY domain
                                   ORDER BY n_tokens DESC, doc_id ASC) AS rn
                       FROM u)
            SELECT domain, doc_id, n_tokens FROM r WHERE rn <= 3""",
        "q109_incremental_dedup_verified": f"""
            WITH {minhash_ctes},
            nb AS (SELECT doc_id, band, bh FROM bands WHERE doc_id % 10 = 0),
            cd AS (SELECT nb.doc_id AS new_id, b2.doc_id AS match_id
                   FROM nb JOIN bands b2 ON nb.band = b2.band AND nb.bh = b2.bh
                   WHERE nb.doc_id <> b2.doc_id
                   GROUP BY 1, 2),
            est AS (SELECT new_id, match_id,
                       round(({" + ".join(f"CAST(l.mh{i} = r.mh{i} AS INT)" for i in range(dedup.MINHASH_K))})
                             / {float(dedup.MINHASH_K)}, 6) AS est_jaccard
                    FROM cd JOIN sigs l ON cd.new_id = l.doc_id
                            JOIN sigs r ON cd.match_id = r.doc_id),
            sur AS (SELECT * FROM est WHERE est_jaccard >= 0.5),
            ver AS (SELECT s.new_id, s.match_id, s.est_jaccard,
                       round(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                             / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))), 6) AS jaccard
                    FROM sur s JOIN docs a ON s.new_id = a.doc_id
                               JOIN docs b ON s.match_id = b.doc_id)
            SELECT new_id, match_id, est_jaccard, jaccard FROM ver WHERE jaccard >= 0.4""",
        "q110_latin_flatten_with_aggs": """
            WITH p AS (SELECT o_custkey, o_orderkey,
                              CAST(floor(o_totalprice) AS BIGINT) AS cents
                       FROM orders),
                 a AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_all,
                              MAX(cents) AS mx
                       FROM p GROUP BY o_custkey),
                 t AS (SELECT o_custkey, o_orderkey,
                              row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY cents DESC, o_orderkey) AS rn
                       FROM p)
            SELECT t.o_custkey AS ck, a.n_all, t.o_orderkey AS top_ok, a.mx
            FROM t JOIN a USING (o_custkey) WHERE t.rn <= 2""",
        "q107_latin_multi_stitch": """
            WITH s1 AS (SELECT n_regionkey, n_nationkey AS nk1,
                               CAST(row_number() OVER (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey) AS BIGINT) AS rn1
                        FROM nation),
                 s2 AS (SELECT n_regionkey, n_name AS nm2,
                               CAST(rank() OVER (PARTITION BY n_regionkey
                                    ORDER BY n_name DESC) AS BIGINT) AS rnk2
                        FROM nation)
            SELECT s1.n_regionkey AS rk, nk1, rn1, nm2, rnk2
            FROM s1 JOIN s2 USING (n_regionkey)""",
        "q108_latin_unordered_limit": """
            WITH r AS (SELECT s_nationkey, s_name,
                              row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_suppkey ASC NULLS FIRST,
                                            s_name ASC NULLS FIRST) AS rn
                       FROM supplier)
            SELECT s_nationkey AS nk, s_name AS pick FROM r WHERE rn <= 2""",
        "q112_latin_bag_pipe": """
            WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
                              row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
                       FROM customer)
            SELECT c_nationkey, c_custkey, c_acctbal FROM r WHERE rn = 1""",
        "q113_latin_nested_cross": """
            SELECT n_name AS nname, r_name AS rname
            FROM nation JOIN region ON n_regionkey = r_regionkey""",
        "q114_latin_inline_group": """
            SELECT CAST(COUNT(l_quantity) AS BIGINT) AS n_rows,
                   CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
            FROM lineitem""",
        "q115_latin_hive_udf": """
            SELECT c_custkey, upper(c_name) AS uname FROM customer""",
        "q122_latin_scripting_udf": """
            WITH b AS (SELECT doc_id,
                              CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                                   ELSE CAST(length(string_split_regex(trim(text), '[ \\t\\n]+')) AS BIGINT)
                              END AS n_tok,
                              CASE WHEN text IS NULL OR trim(text) = '' THEN NULL
                                   ELSE lower(string_split_regex(trim(text), '[ \\t\\n]+')[1])
                              END AS w1,
                              doc_id * doc_id AS sq_id
                       FROM documents)
            SELECT doc_id, n_tok, w1, sq_id FROM b WHERE n_tok > 3""",
        "q121_unigram_lm_score": """
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 flat AS (SELECT doc_id, u.t FROM toks, unnest(toks.tk) AS u(t)),
                 cnt AS (SELECT t, COUNT(*) AS c FROM flat GROUP BY t),
                 tot AS (SELECT SUM(c) AS n FROM cnt),
                 vocab AS (SELECT t, ln(c / tot.n) AS lp FROM cnt, tot
                           ORDER BY c DESC, t ASC LIMIT 4096),
                 scored AS (SELECT f.doc_id,
                                   COALESCE(v.lp, ln(0.000000001)) AS lp
                            FROM flat f LEFT JOIN vocab v ON f.t = v.t)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   round(AVG(lp), 6) AS avg_logp,
                   AVG(lp) > -8.7654321 AS keep
            FROM scored GROUP BY doc_id""",
        "q127_referrer_analysis": """
            WITH u AS (
                SELECT doc_id,
                       'http://' ||
                       CASE CAST(doc_id % 5 AS INT)
                            WHEN 0 THEN 'www.google.com'
                            WHEN 1 THEN 'search.yahoo.com'
                            WHEN 2 THEN 'bing.com'
                            WHEN 3 THEN 'duckduckgo.com'
                            ELSE 'unknown.example.org' END ||
                       '/search?q=' || lang || CAST(doc_id % 10 AS VARCHAR) ||
                       '&hl=en' AS url
                FROM documents),
            e AS (
                SELECT doc_id,
                       lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host,
                       -- the engine table's longest-suffix match, folded to a
                       -- CASE over this query's controlled domain set
                       CASE
                           WHEN lower(url) LIKE 'http://www.google.com/%' THEN 'Google'
                           WHEN lower(url) LIKE 'http://search.yahoo.com/%' THEN 'Yahoo!'
                           WHEN lower(url) LIKE 'http://bing.com/%' THEN 'Bing'
                           WHEN lower(url) LIKE 'http://duckduckgo.com/%' THEN 'DuckDuckGo'
                       END AS engine,
                       -- SearchQuery without the Java lookbehind (RE2):
                       -- same first-match group; terms are plain alnum so
                       -- decode/punct-strip/trim are identity
                       regexp_extract(lower(trim(url)),
                                      '[&?](?:as_)?[pq]=(.*?)(?:$|[&"])', 1) AS q
                FROM u),
            t AS (SELECT doc_id, host, engine,
                         CASE WHEN engine IS NOT NULL THEN substr(q, 1, 80) END AS term
                  FROM e)
            SELECT engine, COUNT(*) AS n_docs,
                   CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
            FROM t GROUP BY engine""",
        "q126_dsir_importance": """
            WITH toks AS (SELECT doc_id, lang,
                                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 flat AS (SELECT doc_id, lang, u.t FROM toks, unnest(toks.tk) AS u(t)),
                 scnt AS (SELECT t, COUNT(*) AS c FROM flat GROUP BY t),
                 stot AS (SELECT SUM(c) AS n FROM scnt),
                 svocab AS (SELECT t, ln(c / stot.n) AS lp FROM scnt, stot
                            ORDER BY c DESC, t ASC LIMIT 4096),
                 tcnt AS (SELECT t, COUNT(*) AS c FROM flat WHERE lang = 'en' GROUP BY t),
                 ttot AS (SELECT SUM(c) AS n FROM tcnt),
                 tvocab AS (SELECT t, ln(c / ttot.n) AS lp FROM tcnt, ttot
                            ORDER BY c DESC, t ASC LIMIT 4096),
                 scored AS (SELECT f.doc_id,
                                   COALESCE(tv.lp, ln(0.000000001))
                                   - COALESCE(sv.lp, ln(0.000000001)) AS lr
                            FROM flat f
                            LEFT JOIN tvocab tv ON f.t = tv.t
                            LEFT JOIN svocab sv ON f.t = sv.t)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   round(AVG(lr), 6) AS avg_log_ratio,
                   round(AVG(lr), 6) > 0 AS keep
            FROM scored GROUP BY doc_id""",
        "q124_tfidf_top_terms": """
            WITH d AS (SELECT doc_id,
                              list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                          x -> x <> '') AS tk
                       FROM documents),
                 n AS (SELECT COUNT(*) AS n_docs FROM d),
                 df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df
                        FROM (SELECT unnest(list_distinct(tk)) AS t FROM d)
                        GROUP BY t),
                 vocab AS (SELECT t, df FROM df ORDER BY df DESC, t ASC LIMIT 4096),
                 scored AS (SELECT d.doc_id, v.t AS term,
                                   round((CAST(len(list_filter(d.tk, x -> x = v.t)) AS DOUBLE)
                                          / len(d.tk))
                                         * ln((n.n_docs + 1.0) / (v.df + 1.0)), 6) AS score
                            FROM d CROSS JOIN n
                            JOIN vocab v ON list_contains(d.tk, v.t)),
                 ranked AS (SELECT doc_id, term, score,
                                   row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS rn
                            FROM scored)
            SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, score
            FROM ranked WHERE rn <= 3""",
        "q128_classifier_broadcast_weights": """
            WITH d AS (SELECT doc_id,
                              list_filter(string_split_regex(trim(text), '\\s+'),
                                          x -> x <> '') AS tk
                       FROM documents),
                 f AS (SELECT doc_id, len(tk) AS n_tokens,
                              list_concat(tk,
                                  CASE WHEN len(tk) >= 2
                                       THEN list_transform(generate_series(1, len(tk) - 1),
                                                           i -> tk[i] || ' ' || tk[i + 1])
                                       ELSE CAST([] AS VARCHAR[]) END) AS feats
                       FROM d),
                 -- weight table: w[b] = ((b*2654435761 + 12345) % 4096)/4096 - 0.5
                 -- (queries._classifier_weights), probed by md5 bucket
                 s AS (SELECT doc_id, n_tokens,
                              CASE WHEN len(feats) > 0 THEN
                                list_sum(list_transform(feats, x ->
                                  (((CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 4096)
                                    * 2654435761 + 12345) % 4096) / 4096.0 - 0.5))
                                / len(feats)
                              END AS score
                       FROM f)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   score, score > 0 AS keep
            FROM s""",
        "q129_paragraph_dedup": """
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(trim(text), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 chunks AS (SELECT doc_id,
                                   list_transform(range(0, CAST(ceil(len(tk) / 25.0) AS INT)),
                                                  i -> array_to_string(tk[i*25+1 : i*25+25], ' ')) AS cs
                            FROM toks),
                 withbp AS (SELECT doc_id,
                                   (CASE WHEN doc_id % 2 = 0
                                         THEN ['subscribe to our newsletter for the latest updates']
                                         ELSE CAST([] AS VARCHAR[]) END)
                                   || cs ||
                                   (CASE WHEN doc_id % 5 = 0
                                         THEN ['all rights reserved unauthorized reproduction prohibited']
                                         ELSE CAST([] AS VARCHAR[]) END) AS ps
                            FROM chunks),
                 p AS (SELECT doc_id, len(ps) AS n_paras,
                              unnest(ps) AS para,
                              generate_subscripts(ps, 1) - 1 AS pos
                       FROM withbp),
                 kept AS (SELECT doc_id, n_paras, pos, para,
                                 row_number() OVER (PARTITION BY md5(para)
                                      ORDER BY doc_id, pos) AS rn
                          FROM p)
            SELECT doc_id, CAST(any_value(n_paras) AS BIGINT) AS n_paras,
                   COUNT(*) AS n_kept,
                   string_agg(para, ' | ' ORDER BY pos) AS clean_text
            FROM kept WHERE rn = 1 GROUP BY doc_id""",
        "q130_bigram_lm_perplexity": "WITH " + _bigram_lm_ctes() + """
            SELECT g.doc_id, CAST(g.n_tokens AS BIGINT) AS n_tokens,
                   CAST(len(g.gs) AS BIGINT) AS n_bigrams,
                   round(a.al, 6) AS avg_logp,
                   a.al > -3.5 AS keep
            FROM gd g LEFT JOIN agg a ON g.doc_id = a.doc_id""",
        "q142_perplexity_partition": "WITH " + _bigram_lm_ctes() + """,
                 base AS (SELECT g.doc_id,
                                 CAST(g.n_tokens AS BIGINT) AS n_tokens,
                                 round(a.al, 6) AS avg_logp
                          FROM gd g JOIN agg a ON g.doc_id = a.doc_id
                          WHERE len(g.gs) > 0),
                 r AS (SELECT doc_id, n_tokens, avg_logp,
                              ROW_NUMBER() OVER (ORDER BY avg_logp DESC,
                                                          doc_id ASC) AS rk,
                              COUNT(*) OVER () AS n
                       FROM base)
            SELECT doc_id, n_tokens, avg_logp,
                   CASE WHEN rk * 3 <= n THEN 'head'
                        WHEN rk * 3 <= 2 * n THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM r""",
        "q144_bpe_train": f"""
            WITH toks AS (SELECT {_toks('lower(text)')} AS tk FROM documents),
                 words AS (SELECT u.t AS w FROM toks, unnest(toks.tk) AS u(t)),
                 wt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
                 idx AS (SELECT w, c,
                                unnest(generate_series(1, length(w) - 1)) AS i
                         FROM wt WHERE length(w) >= 2),
                 p AS (SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, c
                       FROM idx),
                 pc AS (SELECT a, b, SUM(c) AS cnt FROM p GROUP BY a, b),
                 s1 AS (SELECT a || ' ' || b AS pair, cnt FROM pc
                        ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)
            SELECT CAST(1 AS BIGINT) AS step, pair,
                   CAST(cnt AS BIGINT) AS cnt, true AS ok
            FROM s1
            UNION ALL
            SELECT CAST(s AS BIGINT), CAST(NULL AS VARCHAR),
                   CAST(NULL AS BIGINT), true
            FROM (VALUES (2), (3), (4), (5), (6), (99)) t(s)""",
        "q147_contamination_audit": f"""
            WITH wbench AS (SELECT doc_id, {{sh}} AS sh FROM documents
                            WHERE doc_id % 97 = 0),
                 wbg AS (SELECT DISTINCT {{h60}} AS gh
                         FROM wbench, unnest(wbench.sh) AS u(g)),
                 wtrain AS (SELECT doc_id, {{sh}} AS sh FROM documents
                            WHERE doc_id % 97 <> 0),
                 wsizes AS (SELECT doc_id, len(sh) AS n_grams FROM wtrain),
                 wtg AS (SELECT doc_id, {{h60}} AS gh
                         FROM wtrain, unnest(wtrain.sh) AS u(g)),
                 whits AS (SELECT doc_id, COUNT(*) AS n_shared FROM wtg
                           WHERE gh IN (SELECT gh FROM wbg) GROUP BY doc_id),
                 e AS (SELECT s.doc_id,
                              round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE)
                                    / greatest(s.n_grams, 1), 6) >= 0.05 AS exact_hit
                       FROM wsizes s LEFT JOIN whits h USING (doc_id)),
                 lowdocs AS (SELECT doc_id, lower(text) AS t FROM documents),
                 csh AS (SELECT doc_id,
                                list_distinct(list_transform(
                                    range(1, greatest(length(t) - 19, 1) + 1),
                                    i -> substr(t, CAST(i AS INT), 20))) AS g
                         FROM lowdocs),
                 cbg AS (SELECT DISTINCT u.x AS g
                         FROM (SELECT g FROM csh WHERE doc_id % 97 = 0) b,
                              unnest(b.g) AS u(x)),
                 ctrain AS (SELECT doc_id, g FROM csh WHERE doc_id % 97 <> 0),
                 csizes AS (SELECT doc_id, len(g) AS n_grams FROM ctrain),
                 ctg AS (SELECT doc_id, u.x AS g FROM ctrain, unnest(ctrain.g) AS u(x)),
                 chits AS (SELECT doc_id, COUNT(*) AS n_shared FROM ctg
                           WHERE g IN (SELECT g FROM cbg) GROUP BY doc_id),
                 c AS (SELECT s.doc_id,
                              round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE)
                                    / greatest(s.n_grams, 1), 6) >= 0.02 AS char_hit
                       FROM csizes s LEFT JOIN chits h USING (doc_id)),
                 docs AS (SELECT doc_id, {{sh}} AS sh FROM documents),
                 hashed AS (SELECT doc_id, sh,
                                   list_transform(sh, s -> {{h32}}) AS h FROM docs),
                 sigs AS (SELECT doc_id, {{mh}} FROM hashed),
                 bands AS ({{bands}}),
                 eb AS (SELECT doc_id, band, bh FROM bands WHERE doc_id % 97 = 0),
                 tb AS (SELECT doc_id, band, bh FROM bands WHERE doc_id % 97 <> 0),
                 cd AS (SELECT tb.doc_id AS train_id, eb.doc_id AS eval_id
                        FROM tb JOIN eb ON tb.band = eb.band AND tb.bh = eb.bh
                        GROUP BY 1, 2),
                 scored AS (
                    SELECT train_id,
                           ({{agree}}) / {{k}} AS est
                    FROM cd JOIN sigs l ON cd.train_id = l.doc_id
                            JOIN sigs r ON cd.eval_id = r.doc_id),
                 f AS (SELECT DISTINCT train_id AS doc_id FROM scored
                       WHERE est >= 0.5)
            SELECT e.doc_id, e.exact_hit, c.char_hit,
                   (f.doc_id IS NOT NULL) AS fuzzy_hit,
                   e.exact_hit OR c.char_hit OR (f.doc_id IS NOT NULL) AS flagged
            FROM e JOIN c USING (doc_id) LEFT JOIN f USING (doc_id)""".format(
            sh=_shingles("text"),
            h60=_h60("u.g"),
            h32=_h32("s"),
            mh=_minhash_sig_select(),
            bands=_band_rows(),
            agree=" + ".join(
                f"CAST(l.mh{i} = r.mh{i} AS INT)" for i in range(dedup.MINHASH_K)
            ),
            k=float(dedup.MINHASH_K),
        ),
        "q148_c4_rules": f"""
            WITH tk AS (SELECT doc_id, {_toks('lower(text)')} AS tk
                        FROM documents),
                 blocks AS (SELECT doc_id,
                                   list_transform(
                                       range(0, CAST(ceil(len(tk) / 12.0) AS INT)),
                                       i -> array_to_string(tk[i*12+1 : i*12+12], ' ')) AS bs
                            FROM tk),
                 ln AS (SELECT doc_id, g.i - 1 AS pos, bs[g.i] AS block
                        FROM blocks, unnest(generate_series(1, len(bs))) AS g(i)),
                 dec AS (SELECT doc_id, pos,
                                CASE WHEN doc_id % 7 = 0 AND pos = 1
                                     THEN 'please enable javascript to view this site.'
                                     ELSE (CASE WHEN doc_id % 31 = 0 AND pos = 0
                                                THEN 'lorem ipsum ' ELSE '' END)
                                          || block
                                          || (CASE WHEN doc_id % 37 = 0 AND pos = 2
                                                   THEN ' {{' ELSE '' END)
                                          || (CASE WHEN (doc_id + pos) % 3 <> 0
                                                   THEN '.' ELSE '' END)
                                END AS line
                         FROM ln),
                 fl AS (SELECT doc_id, pos, line,
                               (regexp_matches(line, '[.!?"]$')
                                AND len(string_split_regex(line, '\\s+')) >= 5
                                AND NOT contains(line, 'javascript')) AS kept
                        FROM dec)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   bool_or(contains(line, 'lorem ipsum')) AS has_lorem,
                   bool_or(contains(line, '{{')) AS has_brace,
                   md5(COALESCE(string_agg(CASE WHEN kept THEN line END,
                                           chr(10) ORDER BY pos), '')) AS clean_md5,
                   (SUM(CASE WHEN kept THEN 1 ELSE 0 END) >= 3
                    AND NOT bool_or(contains(line, 'lorem ipsum'))
                    AND NOT bool_or(contains(line, '{{'))) AS keep
            FROM fl GROUP BY doc_id""",
        "q146_kmeans_refine": f"""
            WITH c AS (SELECT vec_id AS cid, embedding AS cv
                       FROM embeddings WHERE vec_id < {similarity.IVF_NLIST}),
                 d AS (SELECT e.vec_id, c.cid,
                              list_sum(list_transform(
                                  generate_series(1, {similarity.EMB_DIM}),
                                  i -> (CAST(e.embedding[i] AS DOUBLE)
                                        - CAST(c.cv[i] AS DOUBLE))
                                       * (CAST(e.embedding[i] AS DOUBLE)
                                          - CAST(c.cv[i] AS DOUBLE)))) AS d2
                       FROM embeddings e, c),
                 r AS (SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY d2 ASC, cid ASC) AS rn
                       FROM d)
            SELECT vec_id, CAST(cid AS BIGINT) AS cell0, true AS ok
            FROM r WHERE rn = 1""",
        "q145_bpe_tokenize": f"""
            WITH toks AS (SELECT doc_id, {_toks('lower(text)')} AS tk
                          FROM documents),
                 words AS (SELECT u.t AS w FROM toks, unnest(toks.tk) AS u(t)),
                 wt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
                 idx AS (SELECT w, c,
                                unnest(generate_series(1, length(w) - 1)) AS i
                         FROM wt WHERE length(w) >= 2),
                 pc AS (SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
                               SUM(c) AS cnt
                        FROM idx GROUP BY 1, 2),
                 s1 AS (SELECT a || b AS m FROM pc
                        ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
                 dw AS (SELECT doc_id, u.t AS w FROM toks, unnest(toks.tk) AS u(t))
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(length(w)) AS BIGINT) AS n_chars,
                   CAST(SUM(length(w) - (len(string_split(w, s1.m)) - 1))
                        AS BIGINT) AS n_seg_m1,
                   true AS ok
            FROM dw, s1 GROUP BY doc_id""",
        "q143_training_shards": f"""
            WITH staged AS (
                SELECT doc_id,
                       CAST(n_chars AS BIGINT) AS n_chars,
                       CAST(len({_toks('text')}) AS BIGINT) AS n_tokens,
                       CAST(('0x' || substr(md5(doc_id || ':shard:v1'), 1, 15))
                            AS BIGINT) AS k
                FROM documents)
            SELECT k % 16 AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   MIN(k) AS min_key, MAX(k) AS max_key,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM staged GROUP BY k % 16""",
        "q149_balanced_shards": f"""
            WITH staged AS (
                SELECT doc_id,
                       CAST(len({_toks('text')}) AS BIGINT) AS n_tokens,
                       CAST(('0x' || substr(md5(doc_id || ':bshard:v1'), 1, 15))
                            AS BIGINT) AS k
                FROM documents),
                 cum AS (SELECT doc_id, n_tokens, k,
                                SUM(n_tokens) OVER (ORDER BY k
                                    ROWS UNBOUNDED PRECEDING) - n_tokens AS c,
                                SUM(n_tokens) OVER () AS total
                         FROM staged),
                 a AS (SELECT doc_id, n_tokens, k,
                              LEAST(7, CAST(FLOOR(c * 8.0 / total) AS BIGINT)) AS shard
                       FROM cum)
            SELECT shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   MIN(k) AS min_key, MAX(k) AS max_key,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM a GROUP BY shard""",
        "q150_incremental_substring_dedup": _substr_ctes() + """
                 oldidx AS (SELECT DISTINCT h FROM wins WHERE doc_id % 10 <> 0),
                 nw AS (SELECT * FROM wins WHERE doc_id % 10 = 0),
                 bfirst AS (SELECT h, MIN(doc_id * 1048576 + pos) AS fkey
                            FROM nw GROUP BY h),
                 marked AS (SELECT n.doc_id, n.pos,
                                   (o.h IS NOT NULL) AS in_idx,
                                   (n.doc_id * 1048576 + n.pos <> b.fkey) AS loses
                            FROM nw n LEFT JOIN oldidx o ON n.h = o.h
                                      JOIN bfirst b ON n.h = b.h),
                 dups2 AS (SELECT * FROM marked WHERE in_idx OR loses),
                 kinds AS (SELECT doc_id,
                                  CAST(COUNT(*) FILTER (WHERE in_idx) AS BIGINT)
                                      AS n_dup_vs_index,
                                  CAST(COUNT(*) FILTER (WHERE NOT in_idx) AS BIGINT)
                                      AS n_dup_in_batch
                           FROM dups2 GROUP BY doc_id),
                 cov AS (SELECT doc_id,
                                COUNT(DISTINCT p) AS n_dup_tokens,
                                COUNT(DISTINCT pos) AS n_dup_windows
                         FROM (SELECT doc_id, pos, UNNEST(range(pos, pos + {W})) AS p
                               FROM dups2)
                         GROUP BY doc_id),
                 base AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                                 CAST(greatest(n_tokens - {W} + 1, 0) AS BIGINT) AS n_windows
                          FROM staged WHERE doc_id % 10 = 0)
            SELECT b.doc_id, b.n_tokens, b.n_windows,
                   COALESCE(k.n_dup_vs_index, 0) AS n_dup_vs_index,
                   COALESCE(k.n_dup_in_batch, 0) AS n_dup_in_batch,
                   COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
                   COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
                   round(1.0 * COALESCE(c.n_dup_tokens, 0) / greatest(b.n_tokens, 1), 6) AS dup_ratio,
                   round(1.0 * COALESCE(c.n_dup_tokens, 0) / greatest(b.n_tokens, 1), 6) < 0.2 AS keep
            FROM base b LEFT JOIN kinds k USING (doc_id)
                        LEFT JOIN cov c USING (doc_id)""".format(W=_q137_w()),
        "q152_pq_ann": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
                 cb AS (SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS cv
                        FROM embeddings WHERE vec_id < 16),
                 ms AS (SELECT unnest(range(0, 8)) AS m),
                 sub AS (SELECT e.vec_id, ms.m, cb.j,
                                list_sum(list_transform(range(1, 9), i ->
                                    (e.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                    * (e.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS d2
                         FROM e, ms, cb),
                 best AS (SELECT vec_id, m, MIN(d2) AS mind
                          FROM sub GROUP BY vec_id, m),
                 code AS (SELECT s.vec_id, s.m, MIN(s.j) AS j, MIN(b.mind) AS mind
                          FROM sub s JOIN best b
                            ON s.vec_id = b.vec_id AND s.m = b.m AND s.d2 = b.mind
                          GROUP BY s.vec_id, s.m),
                 qlut AS (SELECT ms.m, cb.j,
                                 list_sum(list_transform(range(1, 9), i ->
                                     (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                     * (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS qd2
                          FROM ms, cb, (SELECT {_pq_query_sql()} AS qv) q)
            SELECT c.vec_id,
                   array_to_string(list(CAST(c.j AS INT) ORDER BY c.m), '-') AS codes,
                   round(SUM(c.mind), 6) AS recon_err,
                   round(SUM(l.qd2), 6) AS adc_dist
            FROM code c JOIN qlut l ON c.m = l.m AND c.j = l.j
            GROUP BY c.vec_id""",
        "q153_ivfpq_probe": f"""
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id < {similarity.IVF_NLIST}),
                 qprobe AS (
                SELECT cid FROM cents
                ORDER BY list_dot_product(cv, {qv}) / (sqrt(list_dot_product(cv, cv)) * {qnorm}) DESC, cid ASC
                LIMIT {similarity.IVF_NPROBE}),
                 ranked AS (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN cents c),
                 cand AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid AS cell
                FROM embeddings e JOIN ranked a ON e.vec_id = a.vec_id AND a.rn = 1
                WHERE a.cid IN (SELECT cid FROM qprobe)),
                 cb AS (SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS cv
                        FROM embeddings WHERE vec_id < 16),
                 ms AS (SELECT unnest(range(0, 8)) AS m),
                 sub AS (SELECT c.vec_id, ms.m, cb.j,
                                list_sum(list_transform(range(1, 9), i ->
                                    (c.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                    * (c.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS d2
                         FROM cand c, ms, cb),
                 best AS (SELECT vec_id, m, MIN(d2) AS mind
                          FROM sub GROUP BY vec_id, m),
                 code AS (SELECT s.vec_id, s.m, MIN(s.j) AS j
                          FROM sub s JOIN best b
                            ON s.vec_id = b.vec_id AND s.m = b.m AND s.d2 = b.mind
                          GROUP BY s.vec_id, s.m),
                 qlut AS (SELECT ms.m, cb.j,
                                 list_sum(list_transform(range(1, 9), i ->
                                     (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                     * (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS qd2
                          FROM ms, cb, (SELECT {qv} AS qv) q)
            SELECT c.vec_id, MIN(cand.cell) AS cell,
                   round(SUM(l.qd2), 6) AS adc_dist
            FROM code c JOIN qlut l ON c.m = l.m AND c.j = l.j
                        JOIN cand ON cand.vec_id = c.vec_id
            GROUP BY c.vec_id
            ORDER BY adc_dist ASC, c.vec_id ASC LIMIT 20""",
        "q155_residual_ivfpq": f"""
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id < {similarity.IVF_NLIST}),
                 qprobe AS (
                SELECT cid FROM cents
                ORDER BY list_dot_product(cv, {qv}) / (sqrt(list_dot_product(cv, cv)) * {qnorm}) DESC, cid ASC
                LIMIT {similarity.IVF_NPROBE}),
                 ranked AS (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN cents c),
                 resid AS (
                SELECT e.vec_id, a.cid AS cell,
                       list_transform(range(1, {similarity.EMB_DIM + 1}), i ->
                           CAST(e.embedding[i] AS DOUBLE) - c2.cv[i]) AS r
                FROM embeddings e JOIN ranked a ON e.vec_id = a.vec_id AND a.rn = 1
                                  JOIN cents c2 ON c2.cid = a.cid),
                 cb AS (SELECT vec_id - {similarity.PQ_RES_SEED_LO} AS j, r AS rv
                        FROM resid
                        WHERE vec_id >= {similarity.PQ_RES_SEED_LO}
                          AND vec_id < {similarity.PQ_RES_SEED_LO + similarity.PQ_K}),
                 cand AS (SELECT vec_id, cell, r FROM resid
                          WHERE cell IN (SELECT cid FROM qprobe)),
                 ms AS (SELECT unnest(range(0, {similarity.PQ_M})) AS m),
                 sub AS (SELECT c.vec_id, ms.m, cb.j,
                                list_sum(list_transform(range(1, 9), i ->
                                    (c.r[ms.m * 8 + i] - cb.rv[ms.m * 8 + i])
                                    * (c.r[ms.m * 8 + i] - cb.rv[ms.m * 8 + i]))) AS d2
                         FROM cand c, ms, cb),
                 best AS (SELECT vec_id, m, MIN(d2) AS mind
                          FROM sub GROUP BY vec_id, m),
                 code AS (SELECT s.vec_id, s.m, MIN(s.j) AS j
                          FROM sub s JOIN best b
                            ON s.vec_id = b.vec_id AND s.m = b.m AND s.d2 = b.mind
                          GROUP BY s.vec_id, s.m),
                 qres AS (SELECT c.cid,
                                 list_transform(range(1, {similarity.EMB_DIM + 1}), i ->
                                     q.qv[i] - c.cv[i]) AS qr
                          FROM cents c, (SELECT {qv} AS qv) q
                          WHERE c.cid IN (SELECT cid FROM qprobe)),
                 qlut AS (SELECT qres.cid, ms.m, cb.j,
                                 list_sum(list_transform(range(1, 9), i ->
                                     (qres.qr[ms.m * 8 + i] - cb.rv[ms.m * 8 + i])
                                     * (qres.qr[ms.m * 8 + i] - cb.rv[ms.m * 8 + i]))) AS qd2
                          FROM ms, cb, qres)
            SELECT c.vec_id, MIN(cand.cell) AS cell,
                   round(SUM(l.qd2), 6) AS adc_dist,
                   true AS refined_ok
            FROM code c JOIN cand ON cand.vec_id = c.vec_id
                        JOIN qlut l ON l.cid = cand.cell AND c.m = l.m AND c.j = l.j
            GROUP BY c.vec_id
            ORDER BY adc_dist ASC, c.vec_id ASC LIMIT 20""",
        "q156_kcenter_coreset": _kcenter_sql(6),
        "q158_sequence_manifest": _SEQ_CTES + """
            SELECT seq_id, doc_id, start_in_doc, start_in_seq, span_len
            FROM spans""",
        # q168: the SFT loss mask over the SAME span manifest — a span
        # [s, s+len) of a doc with prompt length p = (n+2)//3 trains
        # max(0, (s+len) - max(s, p)) tokens; pure integer arithmetic
        "q168_sft_mask_pack": _SEQ_CTES + """,
                 pl AS (SELECT doc_id,
                               CAST((n + 2) // 3 AS BIGINT) AS prompt_len
                        FROM o)
            SELECT sp.seq_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(sp.span_len) AS BIGINT) AS n_tokens,
                   CAST(SUM(greatest(0, (sp.start_in_doc + sp.span_len)
                        - greatest(sp.start_in_doc, pl.prompt_len)))
                        AS BIGINT) AS n_loss_tokens,
                   round(CAST(SUM(greatest(0, (sp.start_in_doc + sp.span_len)
                        - greatest(sp.start_in_doc, pl.prompt_len)))
                        AS DOUBLE) / SUM(sp.span_len), 6) AS loss_ratio
            FROM spans sp JOIN pl USING (doc_id)
            GROUP BY sp.seq_id""",
        # q169: segmentation profile over the replayed 6-merge BPE
        # training (seg6 = the engine's final word-type table)
        "q169_tokenizer_fertility": _bpe_seg_ctes(6) + """
            SELECT CAST(len(seg) AS BIGINT) AS n_pieces,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c) AS BIGINT) AS n_occurrences,
                   CAST(SUM(length(w) * c) AS BIGINT) AS sum_chars,
                   round(AVG(CAST(length(w) AS DOUBLE)), 6) AS avg_type_len
            FROM seg6 GROUP BY 1""",
        "q160_epoch_shuffle": _SEQ_CTES + """,
                 seqs AS (SELECT seq_id, SUM(span_len) AS n_tokens
                          FROM spans GROUP BY seq_id),
                 fanned AS (SELECT seq_id, n_tokens,
                                   unnest(generate_series(0, 2)) AS epoch
                            FROM seqs),
                 keyed AS (SELECT epoch, seq_id, n_tokens,
                                  CAST(('0x' || substr(md5(seq_id || ':epoch:'
                                        || epoch), 1, 15)) AS BIGINT)
                                      AS shuffle_key
                           FROM fanned)
            SELECT CAST(epoch AS BIGINT) AS epoch, seq_id, shuffle_key,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(ROW_NUMBER() OVER (ORDER BY epoch, shuffle_key,
                                           seq_id) AS BIGINT) AS pos
            FROM keyed""",
        "q161_bpe_sequence_pack": _bpe_seg_ctes(6) + """,
                 vocab AS (SELECT DISTINCT u.s AS sym
                           FROM seg6, unnest(seg6.seg) AS u(s)),
                 vid AS (SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY sym ASC)
                                          AS BIGINT) AS id
                         FROM vocab),
                 dseg AS (SELECT w, g.i AS p, seg[g.i] AS sym
                          FROM seg6,
                               unnest(generate_series(1, len(seg))) AS g(i)),
                 dict AS (SELECT w, list(id ORDER BY p) AS ids
                          FROM dseg JOIN vid USING (sym) GROUP BY w),
                 dw AS (SELECT doc_id, pos, ids FROM words JOIN dict USING (w)),
                 docids AS (SELECT doc_id, flatten(list(ids ORDER BY pos)) AS ids
                            FROM dw GROUP BY doc_id),
                 t2 AS (SELECT doc_id, CAST(len(ids) AS BIGINT) AS n
                        FROM docids),
                 o2 AS (SELECT doc_id, n,
                               COALESCE(SUM(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS off
                        FROM t2 WHERE n > 0),
                 s2 AS (SELECT doc_id, n, off,
                               unnest(generate_series(CAST(off // 256 AS BIGINT),
                                   CAST((off + n - 1) // 256 AS BIGINT))) AS seq_id
                        FROM o2),
                 spans2 AS (SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                                   CAST(greatest(off, seq_id * 256) - off
                                        AS BIGINT) AS start_in_doc,
                                   CAST(greatest(off, seq_id * 256) - seq_id * 256
                                        AS BIGINT) AS start_in_seq,
                                   CAST(least(off + n, seq_id * 256 + 256)
                                        - greatest(off, seq_id * 256)
                                        AS BIGINT) AS span_len
                            FROM s2),
                 pieces AS (SELECT sp.seq_id, sp.start_in_seq,
                                   (d.ids)[sp.start_in_doc + 1 :
                                           sp.start_in_doc + sp.span_len] AS piece
                            FROM spans2 sp JOIN docids d USING (doc_id))
            SELECT seq_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(len(piece)) AS BIGINT) AS n_tokens,
                   md5(string_agg(array_to_string(
                           list_transform(piece, x -> CAST(x AS VARCHAR)), ' '),
                       ' ' ORDER BY start_in_seq)) AS fp
            FROM pieces GROUP BY seq_id""",
        "q162_strict_pack": f"""
            WITH RECURSIVE t AS (SELECT doc_id,
                                        CAST(len({_toks('text')}) AS BIGINT) AS n
                                 FROM documents),
                 c AS (SELECT doc_id, n,
                              SUM(n) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
                       FROM t),
                 coarse AS (SELECT doc_id, n,
                                   CAST(FLOOR((cum - n) / 1024.0) AS BIGINT)
                                       AS bucket
                            FROM c),
                 seq AS (SELECT doc_id, n, bucket,
                                ROW_NUMBER() OVER (PARTITION BY bucket
                                                   ORDER BY doc_id) AS rn
                         FROM coarse),
                 r AS (
                     SELECT bucket, rn, doc_id, n,
                            n AS cur, CAST(0 AS BIGINT) AS idx
                     FROM seq WHERE rn = 1
                     UNION ALL
                     SELECT s.bucket, s.rn, s.doc_id, s.n,
                            CASE WHEN r.cur + s.n > 1024 AND r.cur > 0
                                 THEN s.n ELSE r.cur + s.n END,
                            CASE WHEN r.cur + s.n > 1024 AND r.cur > 0
                                 THEN r.idx + 1 ELSE r.idx END
                     FROM r JOIN seq s
                       ON s.bucket = r.bucket AND s.rn = r.rn + 1)
            SELECT doc_id, n AS n_tokens, bucket, idx AS pack FROM r""",
        "q171_bm25_topk": _bm25_sql(),
        "q173_ann_batch_probe": _batch_ivfpq_sql(),
        # q174: 2-round water-filling — every cross-source sum is a
        # left-to-right fold in source order (list_sum ≙ the Spark
        # side's Python sum over the sorted stats); rounding in-plan
        "q174_epoch_budget_planner": f"""
            WITH pd AS (SELECT source,
                               CAST(len({_toks('text')}) AS BIGINT) AS n
                        FROM documents),
                 a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens
                       FROM pd GROUP BY source),
                 tot AS (SELECT SUM(n_tokens) AS total FROM a),
                 w AS (SELECT source, n_tokens,
                              sqrt(CAST(n_tokens AS DOUBLE)) AS w
                       FROM a),
                 sw AS (SELECT list_sum(list(w ORDER BY source)) AS sw
                        FROM w),
                 r1 AS (SELECT source, n_tokens, w,
                               (2 * tot.total * w) / sw.sw AS desired,
                               4.0 * n_tokens AS cap
                        FROM w, tot, sw),
                 r1b AS (SELECT source, n_tokens, w, cap,
                                desired > cap AS capped,
                                CASE WHEN desired > cap THEN cap
                                     ELSE desired END AS alloc1
                         FROM r1),
                 lo AS (SELECT 2 * tot.total
                               - list_sum(list(alloc1 ORDER BY source))
                                   AS leftover,
                               COALESCE(list_sum(list(w ORDER BY source)
                                   FILTER (WHERE NOT capped)), 0.0) AS sw2
                        FROM r1b, tot GROUP BY tot.total),
                 r2 AS (SELECT source, n_tokens, w, capped,
                               CASE WHEN capped OR lo.sw2 <= 0 THEN alloc1
                                    ELSE least(alloc1
                                         + (lo.leftover * w) / lo.sw2, cap)
                               END AS alloc2
                        FROM r1b, lo)
            SELECT source, n_tokens,
                   round(w, 6) AS weight,
                   round(alloc2, 6) AS alloc_tokens,
                   round(alloc2 / n_tokens, 6) AS epochs,
                   capped
            FROM r2""",
        # q172: position ids CONTINUE within a doc across sequence
        # boundaries; segment ids number spans per sequence — both
        # fingerprinted byte-level (the q159 convention)
        "q172_position_ids": _SEQ_CTES + """,
                 ordered AS (SELECT seq_id, start_in_seq, start_in_doc,
                                    span_len,
                                    ROW_NUMBER() OVER (PARTITION BY seq_id
                                        ORDER BY start_in_seq) - 1 AS seg
                             FROM spans),
                 streams AS (SELECT seq_id, start_in_seq, span_len,
                                    array_to_string(generate_series(
                                        start_in_doc,
                                        start_in_doc + span_len - 1), ' ')
                                        AS ps,
                                    array_to_string(list_transform(
                                        generate_series(1, span_len),
                                        z -> seg), ' ') AS ss
                             FROM ordered)
            SELECT seq_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(span_len) AS BIGINT) AS n_tokens,
                   md5(string_agg(ps, ' ' ORDER BY start_in_seq)) AS fp_pos,
                   md5(string_agg(ss, ' ' ORDER BY start_in_seq)) AS fp_seg
            FROM streams GROUP BY seq_id""",
        # q170: FFD replay — recursive CTE whose state is the LIST of
        # remaining bin capacities; list_position returns 0/NULL when
        # no bin fits (both handled), slicing splices the updated bin
        "q170_ffd_pack": f"""
            WITH RECURSIVE t AS (SELECT doc_id,
                                        CAST(len({_toks('text')}) AS BIGINT) AS n
                                 FROM documents),
                 c AS (SELECT doc_id, n,
                              SUM(n) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
                       FROM t),
                 coarse AS (SELECT doc_id, n,
                                   CAST(FLOOR((cum - n) / 4096.0) AS BIGINT)
                                       AS bucket
                            FROM c),
                 seq AS (SELECT doc_id, n, bucket,
                                ROW_NUMBER() OVER (PARTITION BY bucket
                                                   ORDER BY n DESC, doc_id)
                                    AS rn
                         FROM coarse),
                 r AS (
                     SELECT bucket, rn, doc_id, n,
                            CAST(0 AS BIGINT) AS bin,
                            [CAST(1024 - n AS BIGINT)] AS bins
                     FROM seq WHERE rn = 1
                     UNION ALL
                     SELECT s.bucket, s.rn, s.doc_id, s.n,
                            CASE WHEN COALESCE(f.fit, 0) = 0
                                 THEN len(r.bins)
                                 ELSE f.fit - 1 END,
                            CASE WHEN COALESCE(f.fit, 0) = 0
                                 THEN list_append(r.bins,
                                      CAST(1024 - s.n AS BIGINT))
                                 ELSE r.bins[:f.fit-1]
                                      || [r.bins[f.fit] - s.n]
                                      || r.bins[f.fit+1:] END
                     FROM r JOIN seq s
                       ON s.bucket = r.bucket AND s.rn = r.rn + 1,
                          LATERAL (SELECT list_position(
                              list_transform(r.bins, b -> b >= s.n),
                              true) AS fit) f)
            SELECT doc_id, n AS n_tokens, bucket, bin FROM r""",
        "q163_loader_batches": _SEQ_CTES + """,
                 seqs AS (SELECT seq_id, SUM(span_len) AS n_tokens
                          FROM spans GROUP BY seq_id),
                 fanned AS (SELECT seq_id, n_tokens,
                                   unnest(generate_series(0, 2)) AS epoch
                            FROM seqs),
                 keyed AS (SELECT epoch, seq_id, n_tokens,
                                  CAST(('0x' || substr(md5(seq_id || ':epoch:'
                                        || epoch), 1, 15)) AS BIGINT)
                                      AS shuffle_key
                           FROM fanned),
                 ordered AS (SELECT epoch, seq_id, n_tokens,
                                    CAST(ROW_NUMBER() OVER (ORDER BY epoch,
                                        shuffle_key, seq_id) AS BIGINT) AS pos
                             FROM keyed),
                 n AS (SELECT COUNT(*) AS n FROM ordered WHERE epoch = 0)
            SELECT CAST(epoch AS BIGINT) AS epoch, seq_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(pos - 1 - epoch * n.n AS BIGINT) AS pos_in_epoch,
                   CAST(FLOOR((pos - 1 - epoch * n.n) / 32.0) AS BIGINT)
                       AS batch_id,
                   CAST((pos - 1 - epoch * n.n) % 32 AS BIGINT) AS pos_in_batch
            FROM ordered, n""",
        "q164_source_mixture": f"""
            WITH t AS (SELECT doc_id, source,
                              CAST(len({_toks('text')}) AS BIGINT) AS n
                       FROM documents),
                 s AS (SELECT source, SUM(n) AS ns FROM t GROUP BY source),
                 tot AS (SELECT list_sum(list(sqrt(CAST(ns AS DOUBLE))
                                   ORDER BY source)) AS z
                         FROM s),
                 ideal AS (SELECT source, ns,
                                  200.0 * sqrt(CAST(ns AS DOUBLE)) / tot.z
                                      AS ideal
                           FROM s, tot),
                 based AS (SELECT source, ideal,
                                  CAST(FLOOR(ideal) AS BIGINT) AS base,
                                  ideal - FLOOR(ideal) AS frac
                           FROM ideal),
                 lo AS (SELECT CAST(200 - SUM(base) AS BIGINT) AS leftover
                        FROM based),
                 ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY frac DESC,
                                source ASC) AS fr
                            FROM based),
                 q AS (SELECT source, ideal,
                              base + CASE WHEN fr <= lo.leftover
                                          THEN 1 ELSE 0 END AS quota
                       FROM ranked, lo),
                 keyed AS (SELECT source, doc_id,
                                  CAST(('0x' || substr(md5(doc_id || ':mix:v1'),
                                        1, 15)) AS BIGINT) AS k
                           FROM t),
                 sel AS (SELECT source, doc_id,
                                ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY k ASC, doc_id ASC) AS rn
                         FROM keyed)
            SELECT sel.source, sel.doc_id,
                   CAST(sel.rn AS BIGINT) AS sel_rank,
                   CAST(q.quota AS BIGINT) AS quota,
                   round(q.ideal / 200.0, 6) AS w
            FROM sel JOIN q ON sel.source = q.source
            WHERE sel.rn <= q.quota""",
        "q165_fim_transform": f"""
            WITH d AS (SELECT doc_id, {_toks('text')} AS tk FROM documents),
                 m AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n,
                              CAST(('0x' || substr(md5(doc_id || ':fim:p'),
                                    1, 15)) AS BIGINT) AS h1,
                              CAST(('0x' || substr(md5(doc_id || ':fim:m'),
                                    1, 15)) AS BIGINT) AS h2
                       FROM d),
                 cut AS (SELECT doc_id, tk, n,
                                CAST(h1 % (n - 1) AS BIGINT) AS p_len,
                                CAST(1 + (h2 % (n - (h1 % (n - 1)) - 1))
                                     AS BIGINT) AS m_len
                         FROM m WHERE n >= 3),
                 asm AS (SELECT doc_id, n, p_len, m_len,
                                n - p_len - m_len AS s_len,
                                '<PRE> '
                                || COALESCE(array_to_string(
                                       tk[1 : CAST(p_len AS INT)], ' '), '')
                                || ' <SUF> '
                                || COALESCE(array_to_string(
                                       tk[CAST(p_len + m_len + 1 AS INT) :
                                          CAST(n AS INT)], ' '), '')
                                || ' <MID> '
                                || array_to_string(tk[CAST(p_len + 1 AS INT) :
                                                      CAST(p_len + m_len AS INT)], ' ')
                                    AS psm
                         FROM cut)
            SELECT doc_id, n AS n_tokens, p_len, m_len, s_len,
                   md5(psm) AS fp, true AS fim_applied
            FROM asm
            UNION ALL
            SELECT doc_id, n, NULL, NULL, NULL,
                   md5(COALESCE(array_to_string(tk, ' '), '')), false
            FROM m WHERE n < 3""",
        "q166_length_buckets": f"""
            WITH d AS (SELECT CAST(len({_toks('text')}) AS BIGINT) AS n
                       FROM documents),
                 b AS (SELECT n,
                              CASE WHEN n <= 16 THEN 16
                                   WHEN n <= 32 THEN 32
                                   WHEN n <= 64 THEN 64
                                   WHEN n <= 128 THEN 128
                                   WHEN n <= 256 THEN 256
                                   WHEN n <= 512 THEN 512
                                   WHEN n <= 1024 THEN 1024
                                   WHEN n <= 2048 THEN 2048
                                   ELSE 4096 END AS bucket
                       FROM d),
                 g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
                              CAST(SUM(n) AS BIGINT) AS sum_tokens
                       FROM b GROUP BY bucket)
            SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, sum_tokens,
                   CAST(bucket * n_docs AS BIGINT) AS padded_tokens,
                   round(1.0 - CAST(sum_tokens AS DOUBLE) / (bucket * n_docs), 6)
                       AS waste_ratio
            FROM g""",
        "q159_sequence_gather": _SEQ_CTES + f""",
                 dtok AS (SELECT doc_id, {_toks('text')} AS tk
                          FROM documents),
                 pieces AS (SELECT sp.seq_id, sp.start_in_seq,
                                   (d.tk)[sp.start_in_doc + 1 :
                                          sp.start_in_doc + sp.span_len] AS piece
                            FROM spans sp JOIN dtok d USING (doc_id))
            SELECT seq_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(len(piece)) AS BIGINT) AS n_tokens,
                   md5(string_agg(array_to_string(piece, ' '), ' '
                       ORDER BY start_in_seq)) AS fp
            FROM pieces GROUP BY seq_id""",
        "q154_epoch_schedule": f"""
            WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
                 m AS (SELECT doc_id,
                              CAST(len(toks) AS DOUBLE) AS n,
                              CAST(len(list_filter(toks, x ->
                                  list_contains({_sw_list('en')}, lower(x)))) AS DOUBLE) AS sw,
                              toks
                       FROM t),
                 scored AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   round(0.4 * least((CASE WHEN n > 0 THEN sw / n ELSE 0.0 END) / 0.2, 1.0)
                       + 0.3 * least(n / 50.0, 1.0)
                       + 0.3 * (1.0 - least(abs((CASE WHEN n > 0
                             THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / n
                             ELSE 0.0 END) - 5.0) / 5.0, 1.0)), 6) AS q
                   FROM m),
                 tiered AS (SELECT doc_id, n_tokens,
                                   CASE WHEN q >= 0.75 THEN 'high'
                                        WHEN q >= 0.5 THEN 'mid'
                                        ELSE 'low' END AS tier,
                                   CASE WHEN q >= 0.75 THEN 4
                                        WHEN q >= 0.5 THEN 2
                                        ELSE 1 END AS n_epochs
                            FROM scored),
                 sched AS (SELECT doc_id, n_tokens, tier,
                                  CAST(unnest(generate_series(1, n_epochs)) AS INT) AS epoch
                           FROM tiered),
                 keyed AS (SELECT *,
                                  CAST(('0x' || substr(md5(doc_id || ':' || epoch || ':epoch:v1'), 1, 15))
                                       AS BIGINT) AS k
                           FROM sched)
            SELECT tier, epoch,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                   MIN(k) AS min_key, MAX(k) AS max_key
            FROM keyed GROUP BY tier, epoch""",
        "q151_hcat_partitioned": """
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(MAX(doc_id) AS BIGINT) AS max_doc
            FROM documents WHERE lang = 'en' GROUP BY source""",
        "q132_paragraph_near_dup": f"""
            WITH RECURSIVE
                 toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(trim(text), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 chunks AS (SELECT doc_id,
                                   list_transform(range(0, CAST(ceil(len(tk) / 25.0) AS INT)),
                                                  i -> array_to_string(tk[i*25+1 : i*25+25], ' ')) AS cs
                            FROM toks),
                 withbp AS (SELECT doc_id,
                                   (CASE WHEN doc_id % 2 = 0
                                         THEN ['subscribe to our newsletter for the latest updates edition '
                                               || (doc_id % 7)]
                                         ELSE CAST([] AS VARCHAR[]) END)
                                   || cs ||
                                   (CASE WHEN doc_id % 5 = 0
                                         THEN ['all rights reserved unauthorized reproduction prohibited version '
                                               || (doc_id % 3)]
                                         ELSE CAST([] AS VARCHAR[]) END) AS ps
                            FROM chunks),
                 p AS (SELECT doc_id * 1048576 + generate_subscripts(ps, 1) - 1 AS pid,
                              unnest(ps) AS para
                       FROM withbp),
                 firstp AS (SELECT MIN(pid) AS doc_id, MIN(para) AS para
                            FROM p GROUP BY md5(para)),
                 docs AS (SELECT doc_id, {_shingles('para')} AS sh FROM firstp),
                 {minhash_tail},
                 {cc_ctes}
            SELECT node AS pid, MIN(lbl) AS group_id FROM reach GROUP BY node""",
        "q133_multimodal_pipeline": """
            WITH b AS (SELECT doc_id, n_chars, text,
                              CASE CAST(doc_id % 3 AS INT)
                                   WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS modality,
                              CAST(doc_id % 640 + 16 AS INT) AS w,
                              CAST((doc_id * 7) % 480 + 16 AS INT) AS h,
                              CAST(n_chars * 10 AS INT) AS dur
                       FROM documents),
                 img AS (SELECT doc_id,
                                CAST(floor(w * least(1.0, 256.0 / greatest(w, h, 1))) AS INT) AS new_w,
                                CAST(floor(h * least(1.0, 256.0 / greatest(w, h, 1))) AS INT) AS new_h
                         FROM b WHERE modality = 'image'),
                 vid AS (SELECT doc_id,
                                CAST(ceil(greatest(dur, 1) / 1000.0) AS BIGINT) AS n_frames
                         FROM b WHERE modality = 'video'),
                 fe AS (SELECT doc_id,
                               list_transform(range(0, 16), j ->
                                   len(list_filter(range(1, least(length(text), 64) + 1),
                                       i -> ord(substr(text, CAST(i AS INT), 1)) % 16 = CAST(j AS INT)))) AS hist,
                               greatest(least(length(text), 64), 1) AS tot
                        FROM b),
                 fx AS (SELECT doc_id,
                               CAST(list_position(hist, list_max(hist)) - 1 AS INT) AS top_bucket,
                               -- widen the float32 back to double BEFORE round:
                               -- DuckDB's round(REAL) stays REAL and re-widens
                               -- with garbage digits past the 7th
                               round(CAST(CAST(CAST(list_max(hist) AS DOUBLE) / tot AS REAL) AS DOUBLE), 6) AS top_frac
                        FROM fe)
            SELECT b.doc_id, b.modality, img.new_w, img.new_h, vid.n_frames,
                   fx.top_bucket, fx.top_frac
            FROM b JOIN fx USING (doc_id)
                   LEFT JOIN img USING (doc_id) LEFT JOIN vid USING (doc_id)""",
        "q134_char_contamination": """
            WITH lowdocs AS (SELECT doc_id, lower(text) AS t FROM documents),
                 sh AS (SELECT doc_id,
                               list_distinct(list_transform(
                                   range(1, greatest(length(t) - 19, 1) + 1),
                                   i -> substr(t, CAST(i AS INT), 20))) AS g
                        FROM lowdocs),
                 bg AS (SELECT DISTINCT u.x AS g
                        FROM (SELECT g FROM sh WHERE doc_id % 97 = 0) b, unnest(b.g) AS u(x)),
                 train AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 <> 0),
                 sizes AS (SELECT doc_id, len(g) AS n_grams FROM train),
                 tg AS (SELECT doc_id, u.x AS g FROM train, unnest(train.g) AS u(x)),
                 hits AS (SELECT doc_id, COUNT(*) AS n_shared FROM tg
                          WHERE g IN (SELECT g FROM bg) GROUP BY doc_id)
            SELECT s.doc_id,
                   CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
                   CAST(s.n_grams AS BIGINT) AS n_grams,
                   round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / greatest(s.n_grams, 1), 6) AS ratio,
                   round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / greatest(s.n_grams, 1), 6) >= 0.02 AS contaminated
            FROM sizes s LEFT JOIN hits h USING (doc_id)""",
        "q135_corpus_zipf_profile": """
            WITH flat AS (SELECT u.t FROM
                              (SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                                  x -> x <> '') AS tk FROM documents) d,
                              unnest(d.tk) AS u(t)),
                 cnt AS (SELECT t, COUNT(*) AS c FROM flat GROUP BY t),
                 scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                                 CAST(COUNT(*) AS BIGINT) AS n_types,
                                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
                          FROM cnt),
                 top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rnk
                         FROM cnt ORDER BY c DESC, t ASC LIMIT 1000),
                 reg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                                SUM(ln(rnk)) AS sx, SUM(ln(c)) AS sy,
                                SUM(ln(rnk) * ln(c)) AS sxy,
                                SUM(ln(rnk) * ln(rnk)) AS sxx,
                                CAST(SUM(CASE WHEN rnk <= 100 THEN c ELSE 0 END) AS BIGINT) AS top100_tokens
                         FROM top)
            SELECT s.n_tokens, s.n_types,
                   round(CAST(s.n_types AS DOUBLE) / s.n_tokens, 6) AS ttr,
                   round(CAST(s.n_hapax AS DOUBLE) / s.n_types, 6) AS hapax_frac,
                   round(CAST(r.top100_tokens AS DOUBLE) / s.n_tokens, 6) AS top100_share,
                   round((r.k * r.sxy - r.sx * r.sy) / (r.k * r.sxx - r.sx * r.sx), 6) AS zipf_slope
            FROM scal s, reg r""",
        # q137/q138: constants imported from queries (single source
        # of truth); fkey packing doc_id*2^20+pos is oracle-internal
        # (valid while pos < 2^20 — test docs are KBs) and mirrors
        # first_occurrence's lexicographic (doc_id, pos) ordering
        "q137_exact_substring_dedup": _substr_ctes() + """
                 cov AS (SELECT doc_id,
                                COUNT(DISTINCT p) AS n_dup_tokens,
                                COUNT(DISTINCT pos) AS n_dup_windows
                         FROM (SELECT doc_id, pos, UNNEST(range(pos, pos + {W})) AS p
                               FROM dups)
                         GROUP BY doc_id),
                 base AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                                 CAST(greatest(n_tokens - {W} + 1, 0) AS BIGINT) AS n_windows
                          FROM staged)
            SELECT b.doc_id, b.n_tokens, b.n_windows,
                   COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
                   COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
                   round(1.0 * COALESCE(c.n_dup_tokens, 0) / greatest(b.n_tokens, 1), 6) AS dup_ratio,
                   round(1.0 * COALESCE(c.n_dup_tokens, 0) / greatest(b.n_tokens, 1), 6) < 0.2 AS keep
            FROM base b LEFT JOIN cov c USING (doc_id)""".format(W=_q137_w()),
        "q138_exact_substring_removal": _substr_ctes() + """
                 covp AS (SELECT doc_id, UNNEST(range(pos, pos + {W})) AS p FROM dups),
                 tokx AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, tk[CAST(i AS INT)] AS tok
                          FROM staged, UNNEST(range(1, len(tk) + 1)) AS t(i)),
                 kept AS (SELECT k.* FROM tokx k
                          WHERE NOT EXISTS (SELECT 1 FROM covp c
                                            WHERE c.doc_id = k.doc_id AND c.p = k.p)),
                 reb AS (SELECT doc_id, COUNT(*) AS n_clean_tokens,
                                string_agg(tok, ' ' ORDER BY p) AS clean_text
                         FROM kept GROUP BY doc_id),
                 base AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM staged)
            SELECT b.doc_id, b.n_tokens,
                   COALESCE(r.n_clean_tokens, 0) AS n_clean_tokens,
                   COALESCE(r.clean_text, '') AS clean_text
            FROM base b LEFT JOIN reb r USING (doc_id)""".format(W=_q137_w()),
        # q139: the deterministic-boundedness gate (q78's pattern) for
        # the in-engine trainer — training is iterative (not
        # SQL-expressible); its CONTRACT is: exact ln-2 start,
        # strictly-decreasing loss each iteration, net improvement
        "q139_classifier_training": """
            SELECT CAST(i AS BIGINT) AS iter, true AS ok
            FROM (SELECT UNNEST([0, 1, 2, 3, 4, 5, 99]) AS i)""",
        "q136_corpus_clean_v2": """
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(trim(text), '\\s+'),
                                             x -> x <> '') AS tk
                          FROM documents),
                 chunks AS (SELECT doc_id,
                                   list_transform(range(0, CAST(ceil(len(tk) / 25.0) AS INT)),
                                                  i -> array_to_string(tk[i*25+1 : i*25+25], ' ')) AS cs
                            FROM toks),
                 withbp AS (SELECT doc_id,
                                   (CASE WHEN doc_id % 2 = 0
                                         THEN ['subscribe to our newsletter for the latest updates']
                                         ELSE CAST([] AS VARCHAR[]) END)
                                   || cs ||
                                   (CASE WHEN doc_id % 5 = 0
                                         THEN ['all rights reserved unauthorized reproduction prohibited']
                                         ELSE CAST([] AS VARCHAR[]) END) AS ps
                            FROM chunks),
                 p AS (SELECT doc_id, len(ps) AS n_paras,
                              unnest(ps) AS para,
                              generate_subscripts(ps, 1) - 1 AS pos
                       FROM withbp),
                 keptp AS (SELECT doc_id, n_paras, pos, para,
                                  row_number() OVER (PARTITION BY md5(para)
                                       ORDER BY doc_id, pos) AS rn
                           FROM p),
                 rebuilt AS (SELECT doc_id, CAST(any_value(n_paras) AS BIGINT) AS n_paras,
                                    COUNT(*) AS n_kept,
                                    string_agg(para, ' | ' ORDER BY pos) AS clean_text
                             FROM keptp WHERE rn = 1 GROUP BY doc_id),
                 ctk AS (SELECT doc_id, n_paras, n_kept, clean_text,
                                list_filter(string_split_regex(trim(clean_text), '\\s+'),
                                            x -> x <> '') AS tk
                         FROM rebuilt),
                 feats AS (SELECT doc_id, n_paras, n_kept, len(tk) AS n_tokens,
                                  list_concat(tk,
                                      CASE WHEN len(tk) >= 2
                                           THEN list_transform(generate_series(1, len(tk) - 1),
                                                               i -> tk[i] || ' ' || tk[i + 1])
                                           ELSE CAST([] AS VARCHAR[]) END) AS fs
                           FROM ctk),
                 sc AS (SELECT doc_id, n_paras, n_kept, CAST(n_tokens AS BIGINT) AS n_tokens,
                               CASE WHEN len(fs) > 0 THEN
                                 list_sum(list_transform(fs, x ->
                                   (((CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 4096)
                                     * 2654435761) % 4096) / 4096.0 - 0.5))
                                 / len(fs)
                               END AS score
                        FROM feats),
                 lowt AS (SELECT doc_id, lower(clean_text) AS t FROM rebuilt
                          WHERE doc_id % 97 <> 0),
                 tsh AS (SELECT doc_id,
                                list_distinct(list_transform(
                                    range(1, greatest(length(t) - 19, 1) + 1),
                                    i -> substr(t, CAST(i AS INT), 20))) AS g
                         FROM lowt),
                 bg AS (SELECT DISTINCT u.x AS g
                        FROM (SELECT list_distinct(list_transform(
                                  range(1, greatest(length(lower(text)) - 19, 1) + 1),
                                  i -> substr(lower(text), CAST(i AS INT), 20))) AS g
                              FROM documents WHERE doc_id % 97 = 0) b,
                             unnest(b.g) AS u(x)),
                 sizes AS (SELECT doc_id, len(g) AS n_grams FROM tsh),
                 tg AS (SELECT doc_id, u.x AS g FROM tsh, unnest(tsh.g) AS u(x)),
                 hits AS (SELECT doc_id, COUNT(*) AS n_shared FROM tg
                          WHERE g IN (SELECT g FROM bg) GROUP BY doc_id),
                 contam AS (SELECT s.doc_id,
                                   CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
                                   round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE)
                                         / greatest(s.n_grams, 1), 6) >= 0.02 AS contaminated
                            FROM sizes s LEFT JOIN hits h USING (doc_id))
            SELECT sc.doc_id, sc.n_paras, sc.n_kept, sc.n_tokens, sc.score,
                   c.n_shared, c.contaminated,
                   (sc.score > 0) AND NOT COALESCE(c.contaminated, TRUE) AS keep
            FROM sc LEFT JOIN contam c USING (doc_id)""",
        "q131_url_canonical_dedup": """
            WITH u AS (SELECT doc_id,
                              CASE CAST(doc_id % 4 AS INT)
                                   WHEN 0 THEN 'https://example.com/page/' || (doc_id // 4)
                                           || '?id=' || (doc_id // 4)
                                   WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM:443/page/' || (doc_id // 4)
                                           || '?id=' || (doc_id // 4) || '#frag'
                                   WHEN 2 THEN 'https://example.com/page/' || (doc_id // 4)
                                           || '/?utm_source=x&id=' || (doc_id // 4)
                                   ELSE 'https://example.com/page/' || (doc_id // 4)
                                        || '?id=' || (doc_id // 4) || '&utm_campaign=y&fbclid=z'
                              END AS url
                       FROM documents),
                 parts AS (SELECT doc_id,
                                  regexp_replace(trim(url), '#.*$', '') AS nofrag
                           FROM u),
                 split1 AS (SELECT doc_id, nofrag,
                                   regexp_extract(nofrag,
                                       '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)', 1) AS head
                            FROM parts),
                 split2 AS (SELECT doc_id,
                                   -- scheme-matched default ports (r8):
                                   -- :80 only for http, :443 only for https
                                   regexp_replace(
                                       regexp_replace(
                                           regexp_replace(lower(head),
                                               '^(http://[^:/]+):80$', '\\1'),
                                           '^(https://[^:/]+):443$', '\\1'),
                                       '^(https?://)www\\.', '\\1') AS h,
                                   substr(nofrag, length(head) + 1) AS rest
                            FROM split1),
                 split3 AS (SELECT doc_id, h,
                                   regexp_extract(rest, '^([^?]*)', 1) AS path,
                                   regexp_extract(rest, '^[^?]*\\?(.*)$', 1) AS query
                            FROM split2),
                 canon AS (SELECT doc_id,
                                  h ||
                                  (CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
                                        ELSE regexp_replace(path, '/+$', '') END) ||
                                  (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS curl
                           FROM (SELECT doc_id, h, path,
                                        array_to_string(list_sort(list_filter(
                                            string_split(query, '&'),
                                            p -> p <> '' AND NOT regexp_matches(p,
                                                '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))), '&') AS cq
                                 FROM split3) t)
            SELECT curl, COUNT(*) AS n_dups, MIN(doc_id) AS keep_doc_id
            FROM canon GROUP BY curl""",
        "q125_hashed_quality_classifier": """
            WITH d AS (SELECT doc_id,
                              list_filter(string_split_regex(trim(text), '\\s+'),
                                          x -> x <> '') AS tk
                       FROM documents),
                 f AS (SELECT doc_id, len(tk) AS n_tokens,
                              list_concat(tk,
                                  CASE WHEN len(tk) >= 2
                                       THEN list_transform(generate_series(1, len(tk) - 1),
                                                           i -> tk[i] || ' ' || tk[i + 1])
                                       ELSE CAST([] AS VARCHAR[]) END) AS feats
                       FROM d),
                 s AS (SELECT doc_id, n_tokens,
                              CASE WHEN len(feats) > 0 THEN
                                list_sum(list_transform(feats, x ->
                                  (((CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 4096)
                                    * 2654435761) % 4096) / 4096.0 - 0.5))
                                / len(feats)
                              END AS score
                       FROM f)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   score, score > 0 AS keep
            FROM s""",
        "q119_latin_cor_two_pipes": """
            WITH a AS (SELECT o_orderpriority AS p, o_totalprice AS v, o_custkey AS c,
                              row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_orderkey ASC) AS rn
                       FROM orders),
                 b AS (SELECT o_orderpriority AS p, o_totalprice AS v,
                              row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_orderkey DESC) AS rn
                       FROM orders),
                 j AS (SELECT a.p, a.v AS x, b.v AS y, a.c
                       FROM a JOIN b ON a.p = b.p AND a.rn = b.rn
                       WHERE a.rn <= 20)
            SELECT p AS prio, 'var0' AS cx, 'var1' AS cy,
                   round(corr(x, y), 6) AS r,
                   'var0' AS vx, 'var1' AS vy,
                   -- scale-invariant significant-digit rounding (the
                   -- 4-decimal form flaked at 1.2e7 magnitude, r6)
                   CASE WHEN covar_pop(x, c) = 0 THEN 0.0
                        ELSE round(covar_pop(x, c)
                                   / pow(10, floor(log10(abs(covar_pop(x, c))))), 6)
                   END AS cv
            FROM j GROUP BY p""",
        "q120_latin_arr_pipe_ops": """
            WITH tok AS (SELECT lang, u.x AS word
                         FROM (SELECT lang,
                                      string_split_regex(trim(text), '\\s+') AS toks
                               FROM documents) t, unnest(t.toks) AS u(x)
                         WHERE u.x <> ''),
                 f AS (SELECT lang, word FROM tok
                       WHERE word <> 'the' AND word <> 'a'),
                 agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_filtered,
                                CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
                         FROM f GROUP BY lang),
                 d AS (SELECT DISTINCT lang, word FROM f),
                 r AS (SELECT lang, word,
                              row_number() OVER (PARTITION BY lang
                                   ORDER BY word DESC) AS rn
                       FROM d)
            SELECT agg.lang, agg.n_filtered, agg.n_distinct, r.word AS w
            FROM agg JOIN r ON agg.lang = r.lang
            WHERE r.rn <= 5""",
        "q118_latin_hive_udaf": """
            SELECT o_orderpriority AS priority,
                   AVG(o_custkey) AS avg_cust,
                   quantile_cont(o_custkey, 0.5) AS med_cust
            FROM orders GROUP BY o_orderpriority""",
        "q117_latin_inner_flatten": """
            SELECT lang,
                   CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                            x -> x <> ''))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang""",
        "q116_latin_multi_flatten": """
            WITH hi AS (SELECT s_nationkey, s_name, s_acctbal,
                               row_number() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal DESC, s_suppkey) AS rn
                        FROM supplier),
                 lo AS (SELECT s_nationkey, s_name, s_acctbal,
                               row_number() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal ASC, s_suppkey) AS rn
                        FROM supplier)
            SELECT hi.s_nationkey AS nk, hi.s_name AS top_name,
                   hi.s_acctbal AS top_bal, lo.s_name AS low_name,
                   lo.s_acctbal AS low_bal
            FROM hi JOIN lo ON hi.s_nationkey = lo.s_nationkey
            WHERE hi.rn = 1 AND lo.rn = 1""",
        "q90_pii_redaction": f"""
            WITH s AS (
                SELECT doc_id,
                       text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789 call 555-123-4567' AS t
                FROM documents)
            SELECT doc_id,
                   {", ".join(f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}" for name, pat, _ in text.PII_PATTERNS)},
                   md5({_pii_redact_sql('t')}) AS redacted_md5
            FROM s""",
        "q89_repetition": f"""
            WITH t AS (SELECT doc_id, {_toks('lower(text)')} AS toks FROM documents),
            gr AS (SELECT doc_id, {_rep_grams(2)} AS g2, {_rep_grams(3)} AS g3 FROM t),
            g2u AS (SELECT doc_id, u.x AS gram FROM gr, unnest(gr.g2) AS u(x)),
            cnt AS (SELECT doc_id, gram, COUNT(*) AS n FROM g2u GROUP BY 1, 2),
            mx AS (SELECT doc_id, MAX(n) AS mx FROM cnt GROUP BY 1)
            SELECT doc_id, dup_2gram_frac, dup_3gram_frac, top_2gram_frac,
                   (dup_2gram_frac > {text.REP_DUP_2GRAM_MAX} OR top_2gram_frac > {text.REP_TOP_2GRAM_MAX}) AS repetitive
            FROM (
                SELECT gr.doc_id,
                       CASE WHEN len(g2) > 0 THEN round(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) ELSE 0.0 END AS dup_2gram_frac,
                       CASE WHEN len(g3) > 0 THEN round(1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) ELSE 0.0 END AS dup_3gram_frac,
                       CASE WHEN len(g2) > 0 THEN round(CAST(COALESCE(mx.mx, 0) AS DOUBLE) / len(g2), 6) ELSE 0.0 END AS top_2gram_frac
                FROM gr LEFT JOIN mx ON gr.doc_id = mx.doc_id) z""",
        "q42_ngram_jaccard": f"""
            WITH docs AS (SELECT doc_id, {_shingles('text')} AS sh FROM documents),
            posting AS (SELECT doc_id, {_h60('u.g')} AS g FROM docs, unnest(docs.sh) AS u(g)),
            shared AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS inter
                FROM posting l JOIN posting r ON l.g = r.g AND l.doc_id < r.doc_id
                GROUP BY 1, 2),
            sizes AS (SELECT doc_id, len(sh) AS n FROM docs)
            SELECT s.id_a, s.id_b, round(CAST(s.inter AS DOUBLE) / (na.n + nb.n - s.inter), 6) AS jaccard
            FROM shared s JOIN sizes na ON s.id_a = na.doc_id JOIN sizes nb ON s.id_b = nb.doc_id
            WHERE round(CAST(s.inter AS DOUBLE) / (na.n + nb.n - s.inter), 6) >= 0.5""",
        "q43_simhash": f"""
            WITH t AS (SELECT doc_id, {_toks('lower(text)')} AS toks FROM documents)
            SELECT doc_id, {_simhash_expr()} AS simhash FROM t""",
        "q44_cosine_topk": f"""
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {qv})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * {qnorm}), 6) AS score
            FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 20""",
        "q45_cosine_pairs": f"""
            WITH vs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
                        FROM embeddings),
            k AS ({pair_bands_sql}),
            cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                       round(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cos_sim
                FROM k a JOIN k b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
            SELECT id_a, id_b, cos_sim FROM cand WHERE cos_sim >= 0.3""",
        "q123_semantic_dedup": f"""
            WITH RECURSIVE vs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
                        FROM embeddings),
            k AS ({pair_bands_sql}),
            cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                       round(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cos_sim
                FROM k a JOIN k b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
            pairs AS (SELECT id_a, id_b FROM cand WHERE cos_sim >= 0.3),
            ed AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
            nd AS (SELECT DISTINCT a AS node FROM ed),
            reach(node, lbl) AS (
                SELECT node, node FROM nd
                UNION
                SELECT ed.b, r.lbl FROM reach r JOIN ed ON ed.a = r.node WHERE r.lbl < ed.b),
            cc AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node)
            SELECT e.vec_id,
                   COALESCE(cc.comp, e.vec_id) AS group_id,
                   e.vec_id = COALESCE(cc.comp, e.vec_id) AS keep
            FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.node""",
        "q68_ann_ivf": f"""
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id < {similarity.IVF_NLIST}),
            qprobe AS (
                SELECT cid FROM cents
                ORDER BY list_dot_product(cv, {qv}) / (sqrt(list_dot_product(cv, cv)) * {qnorm}) DESC, cid ASC
                LIMIT {similarity.IVF_NPROBE}),
            ranked AS (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN cents c),
            cand AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
                FROM embeddings e JOIN ranked a ON e.vec_id = a.vec_id AND a.rn = 1
                WHERE a.cid IN (SELECT cid FROM qprobe))
            SELECT vec_id,
                   round(list_dot_product(v, {qv}) / (sqrt(list_dot_product(v, v)) * {qnorm}), 6) AS score
            FROM cand ORDER BY score DESC, vec_id ASC LIMIT 20""",
        "q46_ann_lsh": f"""
            WITH b AS (SELECT vec_id, embedding, {bucket_expr} AS bucket FROM embeddings)
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {qv})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * {qnorm}), 6) AS score
            FROM b WHERE bucket IN ({probe_buckets[0]}, {probe_buckets[1]})
            ORDER BY score DESC, vec_id ASC LIMIT 10""",
        "q47_lang_id": f"""
            WITH t AS (SELECT doc_id, {_toks('text')} AS toks FROM documents),
            s AS (SELECT doc_id, {lang_scores} FROM t)
            SELECT {lang_case} AS pred_lang, COUNT(*) AS n FROM s GROUP BY 1""",
        "q48_quality_score": quality,
        "q49_fingerprint": f"""
            WITH fp AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct({_toks('lower(text)')})), ' ')) AS fp FROM documents)
            SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc FROM fp GROUP BY fp""",
        "q50_token_stats": f"""
            SELECT doc_id,
                   CAST(len({_toks('text')}) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens,
                   list_min(list_transform(generate_series(1, greatest(len({_toks('lower(text)')}) - 3, 1)),
                            i -> CAST(('0x' || substr(md5(array_to_string(({_toks('lower(text)')})[i:i+3], ' ')), 1, 8)) AS BIGINT))) AS rolling_fp
            FROM documents""",
        "q81_latin_bigdata_chain": """
            SELECT c_mktsegment AS seg, o_orderpriority AS prio,
                   COUNT(*) AS n,
                   MAX(o_totalprice) AS max_price,
                   MIN(o_totalprice) AS min_price
            FROM customer JOIN orders ON c_custkey = o_custkey
            WHERE c_acctbal > 0.0
            GROUP BY 1, 2""",
        "q80_skewed_join": """
            SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, d.flag_n
            FROM lineitem l JOIN (SELECT l_returnflag, COUNT(*) AS flag_n
                                  FROM lineitem GROUP BY l_returnflag) d
            USING (l_returnflag)""",
        "q82_latin_two_limit_pipes": """
            WITH r1 AS (SELECT l_returnflag AS flag, l_extendedprice, l_quantity,
                               row_number() OVER (PARTITION BY l_returnflag
                                                  ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
                        FROM lineitem),
            r2 AS (SELECT l_returnflag AS flag, l_quantity,
                          row_number() OVER (PARTITION BY l_returnflag
                                             ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC) AS rn
                   FROM lineitem),
            hi AS (SELECT flag, MAX(l_extendedprice) AS max_price,
                          SUM(l_quantity) AS top3_qty, COUNT(*) AS n_top
                   FROM r1 WHERE rn <= 3 GROUP BY flag),
            lo AS (SELECT flag, SUM(l_quantity) AS bot5_qty
                   FROM r2 WHERE rn <= 5 GROUP BY flag)
            SELECT flag, max_price, top3_qty, n_top, bot5_qty
            FROM hi JOIN lo USING (flag)""",
        "q83_latin_distinct_limit": """
            WITH d AS (SELECT DISTINCT l_returnflag AS flag, l_quantity FROM lineitem),
            r AS (SELECT flag, l_quantity,
                         row_number() OVER (PARTITION BY flag ORDER BY l_quantity DESC) AS rn
                  FROM d)
            SELECT flag, SUM(l_quantity) AS top3_qty, COUNT(*) AS n_top
            FROM r WHERE rn <= 3 GROUP BY flag""",
        "q79_latin_nested_limit": """
            WITH r AS (SELECT l_orderkey, l_extendedprice,
                              row_number() OVER (PARTITION BY l_orderkey
                                                 ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
                       FROM lineitem)
            SELECT l_orderkey, SUM(l_extendedprice) AS top2_price, COUNT(*) AS n_top
            FROM r WHERE rn <= 2 GROUP BY l_orderkey""",
        "q51_join_qualified": """
            SELECT n_name AS nation, r_name AS region
            FROM nation JOIN region ON n_regionkey = r_regionkey""",
        "q36_window_over": f"""
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   lag(l_quantity) OVER w AS prev_qty,
                   lead(l_quantity) OVER w AS next_qty,
                   first_value(l_quantity) OVER w AS first_qty,
                   row_number() OVER w AS rn,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) OVER
                        (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty3
            FROM lineitem WHERE l_orderkey <= 1000
            WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber)""",
        "q37_ntile_stats": """
            SELECT c_custkey,
                   ntile(4) OVER w AS quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cdist
            FROM customer WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)""",
        "q52_stream_upper": "SELECT r_regionkey, upper(r_name) AS r_name FROM region",
        "q53_bag_ops": """
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   array_to_string(list_sort(list_distinct(list(CAST(l_quantity AS INT)))), '_') AS qty_str,
                   MAX(CAST(l_quantity AS INT)) AS top_qty
            FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey""",
        "q54_map_ops": """
            SELECT c_custkey,
                   map(['seg','name'], [c_mktsegment, c_name])['seg'][1] AS seg_val,
                   array_to_string(map_keys(map(['seg','name'], [c_mktsegment, c_name])), ',') AS keys_str
            FROM customer""",
        "q55_strsplit": """
            SELECT p_partkey,
                   string_split(p_type, ' ')[1] AS word1,
                   string_split(p_type, ' ')[10] AS word9
            FROM part""",
        "q56_theta_join": """
            SELECT a.n_regionkey AS rk, a.n_name AS name_a, b.n_name AS name_b
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name""",
        "q57_cast_gradual": r"""
            SELECT p_partkey,
                   TRY_CAST(CASE WHEN regexp_matches(p_brand, '#(\d+)$')
                                 THEN regexp_extract(p_brand, '#(\d+)$', 1) END AS INTEGER) AS brand_no,
                   TRY_CAST(p_type AS INTEGER) AS bogus,
                   TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_str_roundtrip
            FROM part""",
        "q58_events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
            FROM events GROUP BY 1, 2""",
        "q77_hypertable_rollup": """
            WITH hourly AS (
                SELECT date_trunc('hour', ts) AS hour, event_type,
                       COUNT(*) AS n,
                       SUM(CAST(value AS DECIMAL(18,4))) AS tot
                FROM events GROUP BY 1, 2)
            SELECT CAST(date_trunc('day', hour) AS TIMESTAMP) AS day, event_type,
                   CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(tot) AS DOUBLE) AS total
            FROM hourly GROUP BY 1, 2""",
        "q86_token_packing": f"""
            WITH staged AS (
                SELECT doc_id, source, len({_toks('text')}) AS toks
                FROM documents),
            packed AS (
                SELECT source, toks,
                       CAST(floor(CAST(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - toks AS DOUBLE) / 2000) AS BIGINT) AS bucket
                FROM staged)
            SELECT source, bucket, COUNT(*) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS n_tokens
            FROM packed GROUP BY source, bucket""",
        "q85_stratified_sample": f"""
            WITH r AS (
                SELECT doc_id, lang, source,
                       row_number() OVER (
                           PARTITION BY lang, source
                           ORDER BY {_h32("CAST(doc_id AS VARCHAR)")} ASC,
                                    CAST(doc_id AS VARCHAR) ASC) AS rn
                FROM documents)
            SELECT doc_id, lang, source FROM r WHERE rn <= 7""",
        "q84_quantile_rollup": """
            SELECT CAST(ts AS DATE) AS day, TRUE AS p50_ok, TRUE AS p95_ok
            FROM events GROUP BY 1""",
        "q78_sketch_uniques": """
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS scope, TRUE AS within_bound
            FROM events GROUP BY CAST(ts AS DATE)
            UNION ALL
            SELECT '__total__' AS scope, TRUE AS within_bound""",
        "q59_nested_distinct": """
            SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS n_items
            FROM lineitem GROUP BY l_orderkey""",
        "q60_nested_filter": """
            SELECT l_returnflag,
                   COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_heavy,
                   COUNT(*) AS n_all
            FROM lineitem GROUP BY l_returnflag""",
        "q61_median": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
                   round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
            FROM lineitem GROUP BY l_returnflag""",
        "q62_corr_cov": """
            SELECT l_linestatus,
                   round(corr(l_quantity, l_extendedprice), 6) AS cor_qp,
                   round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
            FROM lineitem GROUP BY l_linestatus""",
        "q70_latin_script": """
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
            FROM lineitem WHERE l_quantity > 40 AND NOT l_returnflag = 'R'
            GROUP BY l_returnflag""",
        "q67_multimodal_meta": """
            SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                   ELSE 'video' END AS modality,
                   COUNT(*) AS n,
                   CAST(SUM((doc_id % 640) + 16) AS BIGINT) AS sum_w,
                   CAST(SUM((doc_id * 7) % 480 + 16) AS BIGINT) AS sum_h,
                   CAST(SUM(n_chars * 10) AS BIGINT) AS sum_dur
            FROM documents GROUP BY 1""",
        "q69_range_join": f"""
            SELECT n_nationkey AS band_id, COUNT(*) AS n, {_dsum('o_totalprice')} AS total
            FROM orders JOIN nation
              ON o_totalprice >= n_nationkey * 20000.0
             AND o_totalprice < (n_nationkey + 1) * 20000.0
            GROUP BY 1""",
        "q72_latin_nested_block": """
            SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
                   COUNT(CASE WHEN value < 250.0 THEN 1 END) AS n_cheap,
                   MAX(value) AS max_rev
            FROM events GROUP BY user_id""",
        "q73_latin_macro": """
            SELECT 'orders' AS src, o_orderstatus AS key, COUNT(*) AS n, MAX(o_totalprice) AS max_p
            FROM orders GROUP BY o_orderstatus
            UNION ALL
            SELECT 'customer' AS src, c_mktsegment AS key, COUNT(*) AS n, MAX(c_acctbal) AS max_p
            FROM customer GROUP BY c_mktsegment""",
        "q76_corpus_clean": f"""
            WITH tk AS (SELECT doc_id, text, {_toks('text')} AS toks FROM documents),
            sco AS (SELECT doc_id, text, toks, {lang_scores} FROM tk),
            lng AS (SELECT doc_id, text, toks, {lang_case} AS lang FROM sco),
            met AS (SELECT doc_id, text, lang,
                           CAST(len(toks) AS DOUBLE) AS n,
                           CAST(len(list_filter(toks, x -> list_contains({_sw_list('en')}, lower(x)))) AS DOUBLE) AS sw,
                           toks FROM lng),
            scored AS (SELECT doc_id, text, lang,
                   round(0.4 * least((CASE WHEN n > 0 THEN sw / n ELSE 0.0 END) / 0.2, 1.0)
                       + 0.3 * least(n / 50.0, 1.0)
                       + 0.3 * (1.0 - least(abs((CASE WHEN n > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / n ELSE 0.0 END) - 5.0) / 5.0, 1.0)), 6) AS q
                   FROM met),
            base AS (SELECT doc_id, text, q FROM scored WHERE lang = 'en' AND q >= 0.5),
            uniq AS (SELECT doc_id, text, q FROM (
                        SELECT doc_id, text, q,
                               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                        FROM base)
                     WHERE rn = 1),
            docs AS (SELECT doc_id, {_shingles('text')} AS sh FROM uniq),
            hashed AS (SELECT doc_id, sh, list_transform(sh, s -> {_h32('s')}) AS h FROM docs),
            sigs AS (SELECT doc_id, {_minhash_sig_select()} FROM hashed),
            bands AS ({_band_rows()}),
            cands AS (
                SELECT l.doc_id AS id_a, r.doc_id AS id_b
                FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
                GROUP BY 1, 2),
            verified AS (
                SELECT c.id_a, c.id_b,
                       round(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                             / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))), 6) AS jaccard
                FROM cands c JOIN docs a ON c.id_a = a.doc_id JOIN docs b ON c.id_b = b.doc_id)
            SELECT doc_id, q FROM uniq
            WHERE doc_id NOT IN (SELECT id_b FROM verified WHERE jaccard >= 0.4)""",
        "q75_funnel": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tns FROM events),
            s0 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN tns END) AS t0
                   FROM e GROUP BY user_id),
            s1 AS (SELECT e.user_id,
                          MIN(CASE WHEN event_type = 'click' AND tns >= t0 THEN tns END) AS t1
                   FROM e JOIN s0 USING (user_id) GROUP BY e.user_id),
            s2 AS (SELECT e.user_id,
                          MIN(CASE WHEN event_type = 'purchase' AND tns >= t1 THEN tns END) AS t2
                   FROM e JOIN s1 USING (user_id) GROUP BY e.user_id)
            SELECT s0.user_id, t0, t1, t2, (t2 IS NOT NULL) AS completed
            FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)""",
        "q74_latin_cube": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,18))) AS DOUBLE), 2) AS total
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
        "q71_latin_join_script": """
            SELECT c_mktsegment AS seg, COUNT(*) AS n, MAX(o_totalprice) AS max_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "q63_decimal_types": """
            SELECT o_orderstatus,
                   CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,18))) AS DECIMAL(38,6)) AS VARCHAR) AS exact_total,
                   CAST(SUM(CAST(o_orderkey AS DECIMAL(38,0))) AS VARCHAR) AS as_bigint
            FROM orders GROUP BY o_orderstatus""",
        "q64_bloom_filter": _bloom_oracle(),
        "q65_sessionize": """
            WITH x AS (
                SELECT user_id, event_id, epoch_us(ts) AS tns,
                       lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
                FROM events),
            flagged AS (
                SELECT user_id, event_id, tns,
                       CASE WHEN prev IS NULL OR tns - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
                FROM x),
            sessions AS (
                SELECT user_id,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM flagged),
            per_session AS (
                SELECT user_id, session_id, COUNT(*) AS n FROM sessions GROUP BY 1, 2)
            SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events, MAX(n) AS max_session
            FROM per_session GROUP BY user_id""",
        "q66_asof_attribution": """
            WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pts, value
                       FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, epoch_us(ts) AS cts, event_id AS click_id
                  FROM events WHERE event_type = 'click'),
            cand AS (
                SELECT p.event_id, c.click_id, c.cts,
                       row_number() OVER (PARTITION BY p.event_id
                                          ORDER BY c.cts DESC, c.click_id DESC) AS rn
                FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts)
            SELECT p.event_id, p.user_id, p.value, w.click_id, p.pts - w.cts AS gap_us
            FROM p LEFT JOIN (SELECT event_id, click_id, cts FROM cand WHERE rn = 1) w
                 USING (event_id)""",
        **_pigmix_oracles(),
    }
    # q157 probes the STORED index with the same query/k as q153; the
    # round-trip must reproduce the in-memory probe bit-for-bit, so
    # its oracle IS q153's oracle
    out["q157_ann_index_probe"] = out["q153_ivfpq_probe"]
    # q175 embeds the already-oracled q153 (probe) and q44 (exact
    # top-k) bodies as subqueries — one source of truth per side —
    # and intersects them with identical rank keys on both engines
    out["q175_ann_recall_report"] = f"""
            WITH ap AS (SELECT vec_id,
                               ROW_NUMBER() OVER (ORDER BY adc_dist ASC,
                                                  vec_id ASC) AS ra
                        FROM ({out["q153_ivfpq_probe"]}) p),
                 ex AS (SELECT vec_id,
                               ROW_NUMBER() OVER (ORDER BY score DESC,
                                                  vec_id ASC) AS rb
                        FROM ({out["q44_cosine_topk"]}) x),
                 j AS (SELECT ap.ra, ex.rb FROM ap JOIN ex USING (vec_id)),
                 ks(k) AS (VALUES (1), (5), (10), (20))
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(COALESCE(SUM(CASE WHEN j.ra <= ks.k
                                          AND j.rb <= ks.k THEN 1 END), 0)
                        AS BIGINT) AS n_overlap,
                   round(CAST(COALESCE(SUM(CASE WHEN j.ra <= ks.k
                                               AND j.rb <= ks.k THEN 1 END),
                                       0) AS DOUBLE) / ks.k, 6) AS recall
            FROM ks LEFT JOIN j ON true GROUP BY ks.k"""
    # q167 reads the PERSISTED sequence store back and must reproduce
    # the in-memory gather (q159) bit-for-bit — same oracle, same
    # output contract (seq_id, n_spans, n_tokens, fp)
    out["q167_sequence_store_roundtrip"] = out["q159_sequence_gather"]
    return out


def _batch_ivfpq_sql() -> str:
    """q173's DuckDB twin, GENERATED from the same query constant the
    Spark side uses: q153's encode-replay chain (bootstrap centroids
    and codebooks derived from the data) joined against a VALUES
    query table — per-query probe-cell ranking (identical cosine
    expression and (sim DESC, cid ASC) tie-break), per-(query, m, j)
    ADC LUT, the m-ordered fold sum, and per-query top-10 on
    (rounded dist ASC, vec_id ASC)."""
    from .queries import _ann_batch_queries

    vals = ", ".join(
        f"({qid}, {_vec_sql(v)})" for qid, v in _ann_batch_queries()
    )
    return f"""
            WITH qs(qid, qv) AS (VALUES {vals}),
                 cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id < {similarity.IVF_NLIST}),
                 qprobe AS (
                SELECT qid, cid FROM (
                    SELECT q.qid, c.cid,
                           row_number() OVER (PARTITION BY q.qid ORDER BY
                               list_dot_product(c.cv, q.qv)
                               / (sqrt(list_dot_product(c.cv, c.cv))
                                  * sqrt(list_dot_product(q.qv, q.qv)))
                               DESC, c.cid ASC) AS rn
                    FROM cents c, qs q)
                WHERE rn <= {similarity.IVF_NPROBE}),
                 ranked AS (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN cents c),
                 cand AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid AS cell
                FROM embeddings e JOIN ranked a ON e.vec_id = a.vec_id AND a.rn = 1
                WHERE a.cid IN (SELECT DISTINCT cid FROM qprobe)),
                 cb AS (SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS cv
                        FROM embeddings WHERE vec_id < 16),
                 ms AS (SELECT unnest(range(0, 8)) AS m),
                 sub AS (SELECT c.vec_id, ms.m, cb.j,
                                list_sum(list_transform(range(1, 9), i ->
                                    (c.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                    * (c.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS d2
                         FROM cand c, ms, cb),
                 best AS (SELECT vec_id, m, MIN(d2) AS mind
                          FROM sub GROUP BY vec_id, m),
                 code AS (SELECT s.vec_id, s.m, MIN(s.j) AS j
                          FROM sub s JOIN best b
                            ON s.vec_id = b.vec_id AND s.m = b.m AND s.d2 = b.mind
                          GROUP BY s.vec_id, s.m),
                 qlut AS (SELECT q.qid, ms.m, cb.j,
                                 list_sum(list_transform(range(1, 9), i ->
                                     (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])
                                     * (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]))) AS qd2
                          FROM ms, cb, qs q),
                 dists AS (SELECT p.qid, c.vec_id, MIN(cand.cell) AS cell,
                                  round(list_sum(list(l.qd2 ORDER BY l.m)), 6)
                                      AS adc_dist
                           FROM code c
                           JOIN cand ON cand.vec_id = c.vec_id
                           JOIN qprobe p ON p.cid = cand.cell
                           JOIN qlut l ON l.qid = p.qid
                                      AND c.m = l.m AND c.j = l.j
                           GROUP BY p.qid, c.vec_id),
                 fin AS (SELECT qid, vec_id, cell, adc_dist,
                                row_number() OVER (PARTITION BY qid
                                    ORDER BY adc_dist ASC, vec_id ASC) AS rn
                         FROM dists)
            SELECT CAST(qid AS BIGINT) AS qid, vec_id,
                   CAST(cell AS BIGINT) AS cell, adc_dist,
                   CAST(rn AS BIGINT) AS rnk
            FROM fin WHERE rn <= 10"""


def _bm25_sql() -> str:
    """q171's DuckDB twin — identical Okapi BM25 expression tree
    (k1=1.2, b=0.75, idf = ln((N−df+0.5)/(df+0.5)+1)), and the
    per-doc score summed by the SAME left-to-right fold in term
    order (list_sum over list(c ORDER BY t) ≙ F.aggregate over the
    term-sorted bag) so the doubles match bit-for-bit before the
    shared round(…, 6). The query table is generated from the same
    constant the Spark side uses."""
    from .queries import _BM25_QUERIES

    values = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in _BM25_QUERIES
        for t in sorted(set(q.split()))
    )
    return f"""
            WITH toks AS (SELECT doc_id, {_toks('lower(text)')} AS tk
                          FROM documents),
                 terms AS (SELECT doc_id, u.t
                           FROM toks, unnest(toks.tk) AS u(t)),
                 dl AS (SELECT doc_id, COUNT(*) AS dl
                        FROM terms GROUP BY doc_id),
                 tf AS (SELECT doc_id, t, COUNT(*) AS tf
                        FROM terms GROUP BY doc_id, t),
                 dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
                 stats AS (SELECT COUNT(*) AS N, SUM(dl) AS total_dl
                           FROM dl),
                 q(qid, t) AS (VALUES {values}),
                 scored AS (SELECT q.qid, tf.doc_id, tf.t,
                                   ln((stats.N - dfreq.df + 0.5)
                                      / (dfreq.df + 0.5) + 1.0)
                                   * (tf.tf * 2.2)
                                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                      / (CAST(stats.total_dl AS DOUBLE)
                                         / stats.N))) AS c
                            FROM tf
                            JOIN dl USING (doc_id)
                            JOIN dfreq USING (t)
                            JOIN q USING (t), stats),
                 agg AS (SELECT qid, doc_id,
                                round(list_sum(list(c ORDER BY t)), 6)
                                    AS bm25,
                                COUNT(*) AS n_terms
                         FROM scored GROUP BY qid, doc_id),
                 ranked AS (SELECT qid, doc_id, bm25, n_terms,
                                   ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY bm25 DESC, doc_id) AS rnk
                            FROM agg)
            SELECT CAST(qid AS BIGINT) AS qid, doc_id, bm25,
                   CAST(n_terms AS BIGINT) AS n_terms,
                   CAST(rnk AS BIGINT) AS rnk
            FROM ranked WHERE rnk <= 5"""


def _bloom_oracle() -> str:
    """Mirrors functions.bloom exactly: the sparse set-bit list is the
    DISTINCT union of all build-key positions; membership = every probe
    position present."""
    from .functions import bloom

    def pos(key: str, i: int) -> str:
        key_expr = f"CAST({key} AS VARCHAR) || '#{i}'"
        return f"({_h32(key_expr)} % {bloom.BLOOM_M})"

    bits = " UNION ".join(
        f"SELECT {pos('c_custkey', i)} AS p FROM customer" for i in range(bloom.BLOOM_K)
    )
    member = " AND ".join(
        f"({pos('o_orderkey', i)} IN (SELECT p FROM bits))" for i in range(bloom.BLOOM_K)
    )
    return f"""
        WITH bits AS ({bits})
        SELECT ({member}) AS maybe_member, COUNT(*) AS n
        FROM orders GROUP BY 1"""


def _pigmix_oracles() -> dict[str, str]:
    from .pigmix import ORACLES as pigmix_oracles

    return pigmix_oracles
