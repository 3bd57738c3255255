"""DuckDB-SQL implementation of Spark's ``xxhash64`` for oracle parity.

Spark's ``xxhash64(col)`` is XXH64 (Collet's xxHash, public domain spec)
with seed 42 over the value's byte encoding — UTF-8 bytes for strings,
8-byte little-endian for longs — and multi-argument calls chain the
running hash as the next argument's seed. DuckDB ships no xxhash, so the
SimHash pipeline (sketches built from xxhash64 bit votes) had no SQL
oracle until this module: it emits plain-SELECT DuckDB SQL (chained CTE
columns — one hash step per column, so no exponential expression blowup)
that reproduces Spark's hashes bit-for-bit, verified against
``F.xxhash64`` outputs in ``tests/plans/test_oracle_xxh64.py``.

All 64-bit modular arithmetic runs in HUGEINT (128-bit): products of two
64-bit values are computed via 32-bit limb splitting so no intermediate
exceeds 2^98. Strings must be ASCII (code point == byte; the generated
SQL aborts loudly otherwise) but may be ANY length — the 4-accumulator
stripe loop for 32+ byte inputs folds through ``list_reduce`` with a
``LIST<HUGEINT>`` accumulator.
"""

from __future__ import annotations

# XXH64 prime constants (unsigned 64-bit), from the public xxHash spec.
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 18446744073709551616  # 2^64
POW256 = [256**j for j in range(8)]


def _mul64(a: str, b: str) -> str:
    """``(a * b) mod 2^64`` via 32-bit limbs — both operands < 2^64."""
    return (
        f"((({a}) % 4294967296) * (({b}) % 4294967296) + "
        f"(((({a}) % 4294967296) * (({b}) // 4294967296) + "
        f"(({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296) "
        f"* 4294967296) % {M64}"
    )


def _rotl(x: str, r: int) -> str:
    lo_keep = 1 << (64 - r)
    return f"((({x}) % {lo_keep}) * {1 << r} + ({x}) // {lo_keep})"


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def _fmix(pfx: str, h: str) -> list[tuple[str, str]]:
    return [
        (f"{pfx}_e", _xor(h, f"{h} // 8589934592")),  # >> 33
        (f"{pfx}_f", _mul64(f"{pfx}_e", str(P2))),
        (f"{pfx}_g", _xor(f"{pfx}_f", f"{pfx}_f // 536870912")),  # >> 29
        (f"{pfx}_h", _mul64(f"{pfx}_g", str(P3))),
        (pfx, _xor(f"{pfx}_h", f"{pfx}_h // 4294967296")),  # >> 32
    ]


def long_hash_steps(pfx: str, inp: str, seed: str) -> list[tuple[str, str]]:
    """Column steps computing ``xxhash64(long)``: XXH64 of the 8-byte
    value with the given seed column/expression. ``inp`` must already be
    the UNSIGNED 64-bit value (negative longs shifted by 2^64)."""
    return [
        (f"{pfx}_a", _mul64(inp, str(P2))),
        (f"{pfx}_b", _mul64(_rotl(f"{pfx}_a", 31), str(P1))),
        (f"{pfx}_c", _xor(f"(({seed}) + {P5} + 8) % {M64}", f"{pfx}_b")),
        (f"{pfx}_d", f"({_mul64(_rotl(f'{pfx}_c', 27), str(P1))} + {P4}) % {M64}"),
        *_fmix(pfx, f"{pfx}_d"),
    ]


def str_hash_steps(pfx: str, tok: str, seed: str) -> list[tuple[str, str]]:
    """Column steps computing ``xxhash64(string)`` for ASCII strings of
    ANY length: the XXH64 stripe loop (4 accumulators over 32-byte
    blocks, folded via ``list_reduce`` with a ``LIST<HUGEINT>``
    accumulator) for ``len >= 32``, then the shared tail (remaining
    8-byte words, one optional 4-byte chunk, trailing bytes)."""
    l = f"strlen({tok})"
    n32 = f"({l} // 32)"

    def read8_at(base: str) -> str:
        return "(" + " + ".join(
            f"ord(({tok})[{base} + {j + 1}])::HUGEINT * {POW256[j]}"
            for j in range(8)
        ) + ")"

    # ---- stripe loop (len >= 32): acc = [v1, v2, v3, v4] -------------
    v_init = (
        f"[(({seed}) + {P1} + {P2}) % {M64}, "
        f"(({seed}) + {P2}) % {M64}, "
        f"(({seed})) % {M64}, "
        f"(({seed}) + {M64} - {P1}) % {M64}]"
    )
    stripe_items = (
        "[[" + ", ".join(read8_at(f"(s*32 + {8 * j})") for j in range(4)) + "]"
        f" for s in generate_series(0, {n32} - 1)]"
    )
    vround = lambda acc, lane: _mul64(  # noqa: E731
        _rotl(f"(({acc}) + {_mul64(lane, str(P2))}) % {M64}", 31), str(P1)
    )
    stripe_lambda = (
        "(acc, lanes) -> ["
        + ", ".join(vround(f"acc[{i + 1}]", f"lanes[{i + 1}]") for i in range(4))
        + "]"
    )
    # merge: h = rotl(v1,1)+rotl(v2,7)+rotl(v3,12)+rotl(v4,18), then for
    # each v: h = (h ^ round(0, v)) * P1 + P4.
    vs = f"{pfx}_vs"
    merge_sum = (
        f"({_rotl(f'{vs}[1]', 1)} + {_rotl(f'{vs}[2]', 7)} + "
        f"{_rotl(f'{vs}[3]', 12)} + {_rotl(f'{vs}[4]', 18)}) % {M64}"
    )

    def merge_round(h: str, v: str) -> str:
        rv = _mul64(_rotl(_mul64(v, str(P2)), 31), str(P1))
        return f"({_mul64(_xor(h, rv), str(P1))} + {P4}) % {M64}"

    # ---- shared tail ---------------------------------------------------
    # Full 8-byte words AFTER the stripes: word indices n32*4 .. l//8 - 1.
    chunks8 = (
        f"[{read8_at('(8*c)')} for c in generate_series({n32} * 4, {l} // 8 - 1)]"
    )
    round_in = _xor("acc", _mul64(_rotl(_mul64("k", str(P2)), 31), str(P1)))
    round8 = f"({_mul64(_rotl(round_in, 27), str(P1))} + {P4}) % {M64}"
    off4 = f"(({l} // 8) * 8)"
    read4 = "(" + " + ".join(
        f"ord(({tok})[{off4} + {j + 1}])::HUGEINT * {POW256[j]}" for j in range(4)
    ) + ")"
    h4_in = _xor(f"{pfx}_h8", _mul64(read4, str(P1)))
    offb = f"(({l} // 8) * 8 + CASE WHEN {l} % 8 >= 4 THEN 4 ELSE 0 END)"
    bytes_list = f"[ord(({tok})[p])::HUGEINT for p in generate_series({offb} + 1, {l})]"
    bbody = _mul64(_rotl(_xor("acc", _mul64("k", str(P5))), 11), str(P1))
    return [
        (vs,
         f"CASE WHEN {l} >= 32 THEN list_reduce("
         f"list_prepend({v_init}::HUGEINT[], {stripe_items}), {stripe_lambda}) "
         f"END"),
        (f"{pfx}_hm", merge_round(
            merge_round(
                merge_round(merge_round(merge_sum, f"{vs}[1]"), f"{vs}[2]"),
                f"{vs}[3]",
            ),
            f"{vs}[4]",
        )),
        # ASCII guard: strlen counts BYTES while ord() yields code
        # points — non-ASCII would silently diverge from Spark's
        # UTF-8-byte hashing, so abort the oracle loudly instead.
        (f"{pfx}_h0",
         f"CASE WHEN {l} <> length({tok}) THEN "
         f"error('xxh64 oracle: non-ASCII token (byte length <> char "
         f"length); per-char ord() would mis-hash it') "
         f"WHEN {l} >= 32 THEN ({pfx}_hm + {l}) % {M64} "
         f"ELSE (({seed}) + {P5} + {l}) % {M64} END"),
        (f"{pfx}_h8",
         f"CASE WHEN {l} // 8 > {n32} * 4 THEN list_reduce("
         f"list_prepend({pfx}_h0::HUGEINT, {chunks8}), (acc, k) -> {round8}) "
         f"ELSE {pfx}_h0 END"),
        (f"{pfx}_h4",
         f"CASE WHEN {l} % 8 >= 4 THEN "
         f"({_mul64(_rotl(h4_in, 23), str(P2))} + {P3}) % {M64} "
         f"ELSE {pfx}_h8 END"),
        (f"{pfx}_hb",
         f"CASE WHEN {l} > {offb} THEN list_reduce("
         f"list_prepend({pfx}_h4::HUGEINT, {bytes_list}), (acc, k) -> {bbody}) "
         f"ELSE {pfx}_h4 END"),
        *_fmix(pfx, f"{pfx}_hb"),
    ]


def chain(base: str, steps: list[tuple[str, str]], name: str, out: str) -> str:
    """Append one CTE per step (each referencing the previous step's
    column by name) and a final CTE ``out`` selecting ``*``.

    ``out`` is MATERIALIZED: DuckDB inlines plain CTEs at every
    reference, so a downstream query touching the hash column twice
    would re-evaluate the whole chain per reference (measured 2-4×
    blowups on these deliberately huge expression trees)."""
    cur = base
    sql = ""
    for i, (col, expr) in enumerate(steps):
        nxt = f"{name}_{i}"
        sql += f", {nxt} AS (SELECT *, ({expr}) AS {col} FROM {cur})"
        cur = nxt
    sql += f", {out} AS MATERIALIZED (SELECT * FROM {cur})"
    return sql


def bigram_hash_cte(toks_cte: str) -> str:
    """CTE chain from the tokenizer CTE to ``shingled(doc_id, sh)`` —
    Spark's ``shingle_hash64(text, n=2, distinct=False)`` rows, one
    UNSIGNED xxhash64 bigram hash per adjacent token pair.

    Shared by the SimHash and DSIR oracles; token parity with Spark's
    ``tokenize`` is inherited from ``toks_cte`` (the already-hash-green
    MinHash/Jaccard tokenizer)."""
    sql = toks_cte
    sql += """,
    tokpos AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
        FROM toks WHERE len(toks) >= 2
    ),
    tokrows AS MATERIALIZED (SELECT doc_id, pos, toks[pos] AS tok FROM tokpos),
    tokdist AS (SELECT DISTINCT tok FROM tokrows)"""
    # Hash each DISTINCT token once, then join back — the hash chain is
    # the expensive part and corpora repeat tokens heavily.
    sql += chain("tokdist", str_hash_steps("th", "tok", "42"), "thc", "tokhash")
    sql += """,
    thash AS MATERIALIZED (SELECT r.doc_id, r.pos, h.th
              FROM tokrows r JOIN tokhash h USING (tok)),
    bigrams AS MATERIALIZED (
        SELECT a.doc_id, a.pos, a.th AS au, b.th AS bu
        FROM thash a JOIN thash b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bgdist AS (SELECT DISTINCT au, bu FROM bigrams)"""
    sql += chain("bgdist", long_hash_steps("ha", "au", "42"), "hac", "seeded")
    sql += chain("seeded", long_hash_steps("sh", "bu", "ha"), "shc", "bghash")
    sql += """,
    shingled AS (SELECT g.doc_id, h.sh
                 FROM bigrams g JOIN bghash h USING (au, bu))"""
    return sql


def ngram_hash_cte(toks_cte: str, n: int, out: str = "shingled") -> str:
    """CTE chain from the tokenizer CTE to ``out(doc_id, sh)`` — Spark's
    ``shingle_hash64(text, n=n)`` rows as UNSIGNED xxhash64 values, for
    ANY ``n >= 2`` (generalizes :func:`bigram_hash_cte`'s n=2).

    Spark's zip-shift construction folds one token hash per step:
    ``o⁽ᵏ⁾ᵢ = xxhash64(o⁽ᵏ⁻¹⁾ᵢ, th_{i+k-1})``, and two-arg
    ``xxhash64(a, b)`` is ``xxh64(b, seed = xxh64(a, 42))`` — so each
    step here is two chained ``long_hash_steps`` runs over the DISTINCT
    (accumulator, token-hash) pairs (corpora repeat n-gram prefixes
    heavily; hashing distinct pairs once keeps the chain cost at
    O(distinct prefixes), the same economics as the token-hash join).
    Windows that run off the document end drop out of the per-step
    position joins exactly like Spark's valid-length slice.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    sql = toks_cte
    sql += f""",
    tokpos AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
        FROM toks WHERE len(toks) >= {n}
    ),
    tokrows AS MATERIALIZED (SELECT doc_id, pos, toks[pos] AS tok FROM tokpos),
    tokdist AS (SELECT DISTINCT tok FROM tokrows)"""
    sql += chain("tokdist", str_hash_steps("th", "tok", "42"), "thc", "tokhash")
    sql += """,
    thash AS MATERIALIZED (SELECT r.doc_id, r.pos, h.th
              FROM tokrows r JOIN tokhash h USING (tok)),
    cur1 AS MATERIALIZED (SELECT doc_id, pos, th AS h FROM thash)"""
    cur = "cur1"
    for step in range(2, n + 1):
        pairs = f"pair{step}"
        sql += f""",
    {pairs} AS MATERIALIZED (
        SELECT c.doc_id, c.pos, c.h AS hu, t.th AS tu
        FROM {cur} c JOIN thash t
          ON t.doc_id = c.doc_id AND t.pos = c.pos + {step - 1}
    ),
    {pairs}d AS (SELECT DISTINCT hu, tu FROM {pairs})"""
        sql += chain(
            f"{pairs}d",
            long_hash_steps(f"sa{step}", "hu", "42"),
            f"sac{step}",
            f"seed{step}",
        )
        sql += chain(
            f"seed{step}",
            long_hash_steps(f"sh{step}", "tu", f"sa{step}"),
            f"shc{step}",
            f"gh{step}",
        )
        sql += f""",
    cur{step} AS MATERIALIZED (
        SELECT p.doc_id, p.pos, g.sh{step} AS h
        FROM {pairs} p JOIN gh{step} g USING (hu, tu)
    )"""
        cur = f"cur{step}"
    sql += f""",
    {out} AS MATERIALIZED (SELECT doc_id, h AS sh FROM {cur})"""
    return sql


def bloom_decontaminate_oracle(
    toks_cte: str,
    bench_pred: str,
    n: int = 4,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> str:
    """Full DuckDB oracle for ``q_decontaminate_bloom``: recomputes the
    Bloom filter's bit positions bit-for-bit (``pmod(xxhash64(j, g),
    m_bits)`` — the Count-Min seed-chain scheme) over the benchmark's
    n-gram hashes, then flags each corpus doc whose ANY gram has ALL
    ``k`` positions present. Bit-set membership is equivalently
    position-SET membership, so no bit arrays are needed in SQL; the
    deterministic decision — false positives included — must match
    Spark's exactly. ``m_bits`` must be a power of two (signed ``pmod``
    == unsigned modulus).
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    sql = ngram_hash_cte(toks_cte, n)
    sql += f""",
    benchg AS (SELECT DISTINCT s.sh FROM shingled s
               JOIN documents d ON d.doc_id = s.doc_id
               WHERE {bench_pred})"""
    # k probe positions per benchmark gram: h_j = xxh64(g, xxh64(j, 42)).
    for j in range(k):
        sql += chain(
            "benchg" if j == 0 else f"bgp{j - 1}",
            long_hash_steps(f"pj{j}", "sh", str(_const_seed(j))),
            f"pjc{j}",
            f"bgp{j}",
        )
    probes_cols = ", ".join(f"pj{j} % {m_bits} AS p{j}" for j in range(k))
    union_positions = " UNION ".join(
        f"SELECT p{j} AS p FROM bgpos" for j in range(k)
    )
    sql += f""",
    bgpos AS MATERIALIZED (SELECT {probes_cols} FROM bgp{k - 1}),
    bloom AS MATERIALIZED ({union_positions})"""
    # Corpus grams: same k positions; contaminated iff all k in bloom.
    sql += f""",
    corpg AS (SELECT DISTINCT s.doc_id, s.sh FROM shingled s
              JOIN documents d ON d.doc_id = s.doc_id
              WHERE NOT ({bench_pred}))"""
    for j in range(k):
        sql += chain(
            "corpg" if j == 0 else f"cgp{j - 1}",
            long_hash_steps(f"qj{j}", "sh", str(_const_seed(j))),
            f"qjc{j}",
            f"cgp{j}",
        )
    hitc = " AND ".join(
        f"qj{j} % {m_bits} IN (SELECT p FROM bloom)" for j in range(k)
    )
    sql += f""",
    contaminated AS (
        SELECT DISTINCT doc_id FROM cgp{k - 1} WHERE {hitc}
    )
    SELECT d.doc_id AS doc_id,
           (d.doc_id IN (SELECT doc_id FROM contaminated)) AS contaminated
    FROM documents d
    WHERE NOT ({bench_pred})
    ORDER BY doc_id
    """
    return sql


def _const_seed(j: int) -> int:
    """``xxh64(j, 42)`` as a Python-computed constant — the seed Spark's
    two-arg ``xxhash64(lit(j)::bigint, g)`` derives from its first
    argument. Computing it driver-side keeps k chain passes out of the
    oracle SQL."""
    M64 = 1 << 64
    P1 = 0x9E3779B185EBCA87
    P2 = 0xC2B2AE3D27D4EB4F
    P3 = 0x165667B19E3779F9
    P4 = 0x85EBCA77C2B2AE63
    P5 = 0x27D4EB2F165667C5

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) % M64

    a = (j * P2) % M64
    b = (rotl(a, 31) * P1) % M64
    c = ((42 + P5 + 8) % M64) ^ b
    d = ((rotl(c, 27) * P1) % M64 + P4) % M64
    e = d ^ (d >> 33)
    f = (e * P2) % M64
    g = f ^ (f >> 29)
    h = (g * P3) % M64
    return h ^ (h >> 32)


def oph_minhash_oracle(toks_cte: str, n: int = 3, k: int = 64) -> str:
    """Full DuckDB oracle for ``q_oph_minhash``: recomputes the one-
    permutation signatures bit-for-bit — n-gram xxhash64 chain
    (:func:`ngram_hash_cte`), unsigned→signed conversion so the per-
    bucket ``min`` agrees with Spark's signed longs, ``% k`` bucketing
    (== Spark's signed ``pmod`` because ``k`` is a power of two), and
    the circular densification rule as a smallest-forward-distance
    correlated lookup."""
    if k & (k - 1):
        raise ValueError(f"k must be a power of two, got {k}")
    sql = ngram_hash_cte(toks_cte, n)
    sql += f""",
    signed AS (SELECT DISTINCT doc_id,
                      (CASE WHEN sh >= {1 << 63} THEN sh - {1 << 64}
                            ELSE sh END)::BIGINT AS hs,
                      (sh % {k})::INT AS b
               FROM shingled),
    lanes AS (SELECT doc_id, b, min(hs) AS v FROM signed GROUP BY doc_id, b),
    grid AS (SELECT d.doc_id, i.lane::INT AS lane
             FROM (SELECT DISTINCT doc_id FROM lanes) d,
                  (SELECT unnest(generate_series(0, {k - 1})) AS lane) i),
    sparse AS (SELECT g.doc_id, g.lane, l.v FROM grid g
               LEFT JOIN lanes l ON l.doc_id = g.doc_id AND l.b = g.lane),
    dense AS (
        SELECT s.doc_id, s.lane,
               (SELECT t.v FROM sparse t
                WHERE t.doc_id = s.doc_id AND t.v IS NOT NULL
                ORDER BY (t.lane - s.lane + {k}) % {k} LIMIT 1) AS v
        FROM sparse s)
    SELECT doc_id AS id, lane, v FROM dense ORDER BY id, lane
    """
    return sql


def simhash_pairs_oracle(toks_cte: str, max_hamming: int = 3) -> str:
    """Full DuckDB oracle for ``q_dedup_simhash``: token xxhash64 →
    bigram chain (``xxhash64(h_i, h_{i+1})``) → per-bit majority votes →
    64-bit sketch (two 32-bit halves) → all-pairs Hamming ≤ k.

    ``toks_cte`` must be the shared ``WITH toks AS (...)`` tokenizer CTE
    so token parity with Spark's ``tokenize`` is inherited from the
    already-hash-green MinHash/Jaccard oracles.
    """
    # One sum lane per bit over the shingle rows (the same shape Spark's
    # vote aggregate compiles) — the earlier unnest-64-bits form built a
    # 64-element HUGEINT list literal PER (shingle, bit) row, which
    # dominated the oracle's runtime ~20x.
    c_lanes = ", ".join(
        f"sum((sh // {1 << p}) % 2) AS c{p}" for p in range(64)
    )
    lo_bits = " + ".join(
        f"(CASE WHEN 2 * c{p} > n THEN {1 << p} ELSE 0 END)" for p in range(32)
    )
    hi_bits = " + ".join(
        f"(CASE WHEN 2 * c{p} > n THEN {1 << (p - 32)} ELSE 0 END)"
        for p in range(32, 64)
    )
    sql = bigram_hash_cte(toks_cte)
    sql += f""",
    persketch AS (
        SELECT doc_id, count(*) AS n, {c_lanes}
        FROM shingled GROUP BY doc_id
    ),
    sk AS (
        SELECT doc_id,
               CAST({lo_bits} AS BIGINT) AS lo,
               CAST({hi_bits} AS BIGINT) AS hi
        FROM persketch
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INTEGER
               AS hamming
    FROM sk a JOIN sk b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= {max_hamming}
    ORDER BY id_a, id_b
    """
    return sql


def dsir_log_weights_oracle(
    toks_cte: str,
    target_pred: str,
    buckets: int = 4096,
    alpha: float = 1.0,
    round_to: int = 4,
) -> str:
    """Full DuckDB oracle for ``q_dsir_weights`` (DSIR, Xie et al. 2023):
    hashed-bigram importance log-weights
    ``Σ_g [ln p̂_target(bucket(g)) − ln p̂_raw(bucket(g))]`` with add-α
    smoothing over ``buckets`` hash buckets.

    ``target_pred`` is a SQL predicate over ``documents`` selecting the
    target-domain rows (e.g. ``lang = 'en'``). ``buckets`` must be a
    power of two: the oracle's hashes are UNSIGNED, Spark's are signed
    longs, and ``unsigned % 2^k == pmod(signed, 2^k)`` since ``2^k``
    divides ``2^64`` — any other modulus would diverge on negative
    hashes.
    """
    if buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two, got {buckets}")
    a = float(alpha)
    sql = bigram_hash_cte(toks_cte)
    sql += f""",
    bux AS MATERIALIZED (SELECT doc_id, sh % {buckets} AS b FROM shingled),
    tbux AS MATERIALIZED (
        SELECT x.doc_id, x.b FROM bux x
        JOIN documents d ON d.doc_id = x.doc_id WHERE {target_pred}
    ),
    raw_c AS (SELECT b, count(*)::DOUBLE AS cr FROM bux GROUP BY b),
    tgt_c AS (SELECT b, count(*)::DOUBLE AS ct FROM tbux GROUP BY b),
    tots AS (SELECT (SELECT count(*) FROM bux)::DOUBLE AS tr,
                    (SELECT count(*) FROM tbux)::DOUBLE AS tt),
    ratio AS (
        SELECT r.b,
               ln(coalesce(t.ct, 0) + {a}) - ln(tt + {a} * {buckets})
               - ln(r.cr + {a}) + ln(tr + {a} * {buckets}) AS lr
        FROM raw_c r LEFT JOIN tgt_c t USING (b), tots
    )
    SELECT x.doc_id AS id, round(sum(lr), {round_to}) AS log_weight
    FROM bux x JOIN ratio USING (b)
    GROUP BY x.doc_id ORDER BY id
    """
    return sql


def count_min_estimate_oracle(
    table: str,
    key: str,
    probe_pred: str,
    depth: int = 4,
    width: int = 1024,
    eps_slack: str = "ceil(2.7182818284590452 * total / {width})",
) -> str:
    """Full DuckDB oracle for Count-Min estimation over BIGINT keys.

    Recomputes the sketch cells bit-for-bit: Spark's
    ``xxhash64(lit(d)::bigint, key)`` chains ``h_d = xxh64(d, 42)`` then
    ``xxh64(key, h_d)``; buckets are ``% width`` on the UNSIGNED hash,
    equal to Spark's signed ``pmod`` because ``width`` is a power of two.
    Emits ``(key, est, exact, tight)`` for keys matching ``probe_pred``
    (over column ``k``), where ``tight`` checks the classic one-sided
    bound ``exact ≤ est ≤ exact + e·N/width``.
    """
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    slack = eps_slack.format(width=width)
    sql = f"""
    WITH freq AS (
        SELECT {key} AS k, count(*) AS c FROM {table}
        WHERE {key} IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT sum(c)::DOUBLE AS total FROM freq),
    ds AS (SELECT unnest(generate_series(0, {depth - 1})) AS d)"""
    sql += chain("ds", long_hash_steps("sd", "d", "42"), "sdc", "seeds")
    sql += """,
    pairs AS (SELECT f.k, s.d, s.sd FROM freq f CROSS JOIN seeds s)"""
    sql += chain("pairs", long_hash_steps("kb", "k", "sd"), "kbc", "keycells")
    sql += f""",
    kc AS MATERIALIZED (SELECT k, d, (kb % {width})::INTEGER AS b
                        FROM keycells),
    cells AS (SELECT kc.d, kc.b, sum(f.c)::BIGINT AS cnt
              FROM kc JOIN freq f USING (k) GROUP BY kc.d, kc.b),
    est AS (SELECT kc.k, min(cells.cnt)::BIGINT AS est
            FROM kc JOIN cells USING (d, b) GROUP BY kc.k)
    SELECT e.k AS key, e.est AS est, f.c AS exact,
           (e.est >= f.c AND e.est <= f.c + {slack}) AS tight
    FROM est e JOIN freq f USING (k), tot
    WHERE {probe_pred}
    ORDER BY key
    """
    return sql
