"""DuckDB SQL oracle generators for the sketch lanes.

The driver's correctness harness compares every Spark query against an ANSI
SQL string run by DuckDB on the same parquet tables. Round 1 registered the
MinHash/CMinHash/Rho/SimHash lanes rows-only ("sketch math not SQL-
expressible"); this module removes that excuse by expressing the exact
bit-level kernels in DuckDB SQL:

- u64 values ride as HUGEINT in [0, 2^64); every wrapping op is explicit
  ``% 2^64`` and 64x64->128-bit products are decomposed into 32-bit limbs
  (DuckDB HUGEINT is 127-bit signed, so a raw u64*u64 would overflow).
- fxhash64 (calculate_hash_fast, /root/reference/src/utils.rs:129-185) is a
  CTE chain over one row per shingle: byte list -> length-class seeds ->
  16-byte-stride fold via list_reduce over {x, y} word structs ->
  multiply_mix -> rotl(h*K, 26).
- R-MinHash / C-MinHash min-folds join the per-shingle hash rows against an
  inlined VALUES table of permutation constants generated from
  kernels/prng.py (Xoshiro256++ stream, the same table the Spark UDFs use).
- calculate_band_hash (utils.rs:194-223) is a list_reduce over pair-packed
  u64 values: state = (state + val) * K, finished with rotl 26.
- splitmix64 (rho.rs:34-39) backs the Rho mixer chain + sparse verify sigs.

Everything is generated, never hand-copied: change RensaConfig and the SQL
follows. Correctness of each generated stage is pytest-proven against the
numpy kernels directly through DuckDB (tests/test_duck_oracles.py) before the
driver ever sees it.
"""

from __future__ import annotations

from rensa_spark.config import DEFAULT_RHO_SHORT_FULL_TOKEN_THRESHOLD, RensaConfig
from rensa_spark.kernels.fxhash import K, PREVENT_TRIVIAL_ZERO_COLLAPSE, SEED1, SEED2
from rensa_spark.kernels.prng import (
    cminhash_params,
    cminhash_pi_precomputed,
    rminhash_permutations,
    splitmix64_py,
)

M64 = 1 << 64
M32 = 1 << 32
_ROT = 26

# ------------------------------------------------------------- u64 helpers


def _xor(x: str, y: str) -> str:
    return f"xor(({x})::HUGEINT, ({y})::HUGEINT)"


def _lo64mul(x: str, y: str) -> str:
    """Low 64 bits of x*y for x, y in [0, 2^64): split x into 32-bit limbs so
    no intermediate exceeds ~2^96 (HUGEINT-safe)."""
    return (
        f"(((({x}) % {M32}) * ({y}) + "
        f"(((({x}) // {M32}) * ({y})) % {M32}) * {M32}) % {M64})"
    )


def _mulmix(x: str, y: str) -> str:
    """multiply_mix (utils.rs:55-66): hi ^ lo of the 128-bit product.
    Mirrors kernels/fxhash.py:_mul_hi_lo limb decomposition. ``x``/``y``
    must be short column refs (they are textually duplicated)."""
    xl, xh = f"(({x}) % {M32})", f"(({x}) // {M32})"
    yl, yh = f"(({y}) % {M32})", f"(({y}) // {M32})"
    lo_lo = f"({xl} * {yl})"
    u = f"({xh} * {yl} + {lo_lo} // {M32})"
    v = f"({xl} * {yh} + {u} % {M32})"
    hi = f"(({xh} * {yh} + {u} // {M32} + {v} // {M32}) % {M64})"
    lo = _lo64mul(x, y)
    return _xor(hi, lo)


def _rotl(x: str, k: int = _ROT) -> str:
    return f"(((({x}) * {1 << k}) % {M64}) + (({x}) // {1 << (64 - k)}))"


def _sm64(v: str) -> str:
    """splitmix64 mix step (rho.rs:34-39 / kernels/prng.py:29-44).
    ``v`` must be a short column ref."""
    t0 = f"((({v}) + {0x9E3779B97F4A7C15}::HUGEINT) % {M64})"
    t1 = _lo64mul(_xor(t0, f"({t0}) // {1 << 30}"), str(0xBF58476D1CE4E5B9))
    t2 = _lo64mul(_xor(t1, f"({t1}) // {1 << 27}"), str(0x94D049BB133111EB))
    return _xor(t2, f"({t2}) // {1 << 31}")


XXH_P1 = 0x9E3779B185EBCA87
XXH_P2 = 0xC2B2AE3D27D4EB4F
XXH_P3 = 0x165667B19E3779F9
XXH_P4 = 0x85EBCA77C2B2AE63
XXH_P5 = 0x27D4EB2F165667C5


def xxhash64_long_ctes(src: str, id_col: str, seed: int = 42,
                       prefix: str = "xx") -> str:
    """CTE chain computing Spark's ``xxhash64`` of a BIGINT column — XXH64
    over the value's 8 little-endian bytes with Spark's default seed 42
    (one 8-byte round + avalanche; the single-long fast path of the public
    XXH64 spec). Final CTE ``{prefix}h({id_col}, xxh)`` carries the SIGNED
    64-bit hash, matching Spark LongType ordering — this is what makes a
    distributed ``ORDER BY xxhash64(id)`` sample reproducible in SQL."""
    h0 = (seed + XXH_P5 + 8) % M64
    p = prefix
    step1 = _lo64mul("u", str(XXH_P2))
    step3 = _xor(str(h0), _lo64mul("b", str(XXH_P1)))
    step4 = f"(({_lo64mul(_rotl('c', 27), str(XXH_P1))} + {XXH_P4}) % {M64})"
    step5 = _lo64mul(_xor("d", f"d // {1 << 33}"), str(XXH_P2))
    step6 = _lo64mul(_xor("e", f"e // {1 << 29}"), str(XXH_P3))
    return f"""
{p}0 AS (SELECT {id_col}, ((({id_col}::HUGEINT % {M64}) + {M64}) % {M64}) AS u FROM {src}),
{p}1 AS (SELECT {id_col}, {step1} AS a FROM {p}0),
{p}2 AS (SELECT {id_col}, {_rotl('a', 31)} AS b FROM {p}1),
{p}3 AS (SELECT {id_col}, {step3} AS c FROM {p}2),
{p}4 AS (SELECT {id_col}, {step4} AS d FROM {p}3),
{p}5 AS (SELECT {id_col}, {step5} AS e FROM {p}4),
{p}6 AS (SELECT {id_col}, {step6} AS w FROM {p}5),
{p}h AS MATERIALIZED (
    SELECT {id_col},
           (CASE WHEN fv >= {1 << 63} THEN fv - {M64} ELSE fv END)::BIGINT AS xxh
    FROM (SELECT {id_col}, {_xor('w', f'w // {1 << 32}')} AS fv FROM {p}6))"""


def _r64(bl: str, off: str) -> str:
    """LE u64 read of 8 bytes at 0-based offset ``off`` of 1-indexed byte
    list ``bl`` (hash_bytes word reads, utils.rs:27-43)."""
    terms = " + ".join(
        f"({bl})[(({off})::BIGINT + {j + 1})] * {256 ** j}" for j in range(8)
    )
    return f"({terms})"


def _r32(bl: str, off: str) -> str:
    terms = " + ".join(
        f"({bl})[(({off})::BIGINT + {j + 1})] * {256 ** j}" for j in range(4)
    )
    return f"({terms})"


# -------------------------------------------------------- shared CTE blocks


def shingle_hash_ctes(cfg: RensaConfig, src: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """CTE chain ending in ``hashes(doc_id, ord, h)``: one row per word
    n-gram shingle, ``h`` = calculate_hash_fast of its UTF-8 bytes as a
    HUGEINT u64, ``ord`` = 1-based shingle position (document order, needed
    by the Rho midpoint sampler). Corpus is ASCII (verified over every SF),
    so byte values == code points."""
    n = cfg.ngram_size
    gram_concat = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    fold_elem = (
        "{'x': " + _r64("bl", "16 * k") + ", 'y': " + _r64("bl", "16 * k + 8") + "}"
    )
    fold_lambda = (
        "{'x': acc.y, 'y': "
        + _mulmix(_xor("acc.x", "e.x"), _xor(str(PREVENT_TRIVIAL_ZERO_COLLAPSE), "e.y"))
        + "}"
    )
    s1_short = "(bl[(L)::BIGINT] * 256 + bl[(L // 2)::BIGINT + 1])"
    return f"""
toks AS (
    SELECT {id_col} AS doc_id,
           list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t <> '') AS tokens
    FROM {src}),
grams AS (
    SELECT doc_id,
           CASE WHEN len(tokens) < {n} THEN tokens
                ELSE list_transform(generate_series(1, len(tokens) - {n - 1}),
                                    i -> {gram_concat}) END AS gs
    FROM toks),
sh AS (
    SELECT doc_id, unnest(gs) AS g,
           unnest(generate_series(1, len(gs))) AS ord
    FROM grams),
sb AS (
    SELECT doc_id, ord, length(g)::HUGEINT AS L,
           list_transform(string_split_regex(g, ''), c -> unicode(c)::HUGEINT) AS bl
    FROM sh),
fold AS (
    SELECT doc_id, ord, L, bl,
           CASE WHEN L > 16 THEN list_reduce(
               list_prepend({{'x': {SEED1}::HUGEINT, 'y': {SEED2}::HUGEINT}},
                   list_transform(generate_series(0, ((L - 17) // 16)::BIGINT),
                                  k -> {fold_elem})),
               (acc, e) -> {fold_lambda})
           ELSE NULL END AS fw
    FROM sb),
st AS (
    SELECT doc_id, ord, L,
           CASE WHEN L = 0 THEN {SEED1}::HUGEINT
                WHEN L <= 3 THEN {_xor(str(SEED1), 'bl[1]')}
                WHEN L <= 7 THEN {_xor(str(SEED1), _r32('bl', '0'))}
                WHEN L <= 16 THEN {_xor(str(SEED1), _r64('bl', '0'))}
                ELSE {_xor('fw.x', _r64('bl', 'L - 16'))} END AS s0c,
           CASE WHEN L = 0 THEN {SEED2}::HUGEINT
                WHEN L <= 3 THEN {_xor(str(SEED2), s1_short)}
                WHEN L <= 7 THEN {_xor(str(SEED2), _r32('bl', 'L - 4'))}
                WHEN L <= 16 THEN {_xor(str(SEED2), _r64('bl', 'L - 8'))}
                ELSE {_xor('fw.y', _r64('bl', 'L - 8'))} END AS s1c
    FROM fold),
pre AS (SELECT doc_id, ord, {_xor(_mulmix('s0c', 's1c'), 'L')} AS hb FROM st),
hk AS (SELECT doc_id, ord, {_lo64mul('hb', str(K))} AS hkv FROM pre),
hashes AS MATERIALIZED (SELECT doc_id, ord, {_rotl('hkv')} AS h FROM hk)"""


def _perm_values(cfg: RensaConfig) -> str:
    a, b = rminhash_permutations(cfg.num_perm, cfg.seed)
    rows = ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(cfg.num_perm)
    )
    return f"perms AS (SELECT * FROM (VALUES {rows}) AS _p(i, a, b))"


def rminhash_slot_ctes(cfg: RensaConfig) -> str:
    """CTEs (assumes ``hashes`` + doc universe ``docs(doc_id)`` exist) ending
    in ``grid(doc_id, i, slot)``: u32 signature slots, empty rows = u32::MAX
    (kernels/rminhash.py semantics: min over tokens of (a*h+b mod 2^64),
    digest = value >> 32)."""
    return f"""
{_perm_values(cfg)},
sigs AS (
    SELECT doc_id, p.i,
           min(({_lo64mul('p.a', 'h')} + p.b) % {M64}) AS mn
    FROM hashes CROSS JOIN perms p GROUP BY doc_id, p.i),
grid AS MATERIALIZED (
    SELECT d.doc_id, p.i,
           coalesce(s.mn // {M32}, {M32 - 1}) AS slot
    FROM docs d CROSS JOIN perms p
    LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.i = p.i)"""


_SIGNED32 = "(CASE WHEN slot >= 2147483648 THEN slot - 4294967296 ELSE slot END)"


def minhash_signature_stats_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_minhash_signature_stats: per-doc abs-sum / min / max of
    the int32-bit-pattern signature slots."""
    return f"""
WITH {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
{rminhash_slot_ctes(cfg)}
SELECT doc_id,
       sum(abs({_SIGNED32}))::BIGINT AS sig_abs_sum,
       min({_SIGNED32})::BIGINT AS sig_min,
       max({_SIGNED32})::BIGINT AS sig_max
FROM grid GROUP BY doc_id ORDER BY doc_id"""


def cminhash_signature_stats_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_cminhash_signature_stats: slot k = min over tokens of
    (pi_c*(sigma_a*h + sigma_b) + pi_c*k + pi_d) mod 2^64, digest = >> 32
    (kernels/cminhash.py / src/cminhash/core.rs:38-46)."""
    sigma_a, sigma_b, pi_c, pi_d = cminhash_params(cfg.seed)
    pre = cminhash_pi_precomputed(cfg.num_perm, pi_c, pi_d)
    pip = ", ".join(f"({k}, {int(pre[k])}::HUGEINT)" for k in range(cfg.num_perm))
    inner = f"({_lo64mul(str(sigma_a), 'h')} + {sigma_b}) % {M64}"
    return f"""
WITH {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
pip AS (SELECT * FROM (VALUES {pip}) AS _p(k, pre)),
cmbase AS (SELECT doc_id, {_lo64mul(str(pi_c), f'(({inner}))')} AS base FROM hashes),
sigs AS (
    SELECT doc_id, p.k, min((base + p.pre) % {M64}) AS mn
    FROM cmbase CROSS JOIN pip p GROUP BY doc_id, p.k),
grid AS (
    SELECT d.doc_id, p.k,
           coalesce(s.mn // {M32}, {M32 - 1}) AS slot
    FROM docs d CROSS JOIN pip p
    LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.k = p.k)
SELECT doc_id,
       sum(abs({_SIGNED32}))::BIGINT AS sig_abs_sum,
       min({_SIGNED32})::BIGINT AS sig_min
FROM grid GROUP BY doc_id ORDER BY doc_id"""


def band_hash_ctes(cfg: RensaConfig, fold: int = 1, prefix: str = "",
                   grid: str = "grid") -> str:
    """CTEs from ``grid(doc_id, i, slot)`` to ``{prefix}bh(doc_id, band_idx,
    band_hash)``: calculate_band_hash over each effective band's slots —
    u32 pairs packed little-first into u64, state = (state + val) * K per
    write, finish rotl(state, 26) (utils.rs:194-223 / kernels/fxhash.py
    band_hash_u64; fold-by-widening per src/lsh.rs:107-123)."""
    eff_size = (cfg.num_perm // cfg.num_bands) * fold
    p = prefix
    return f"""
{p}bslots AS (
    SELECT doc_id, (i // {eff_size})::INT AS band_idx,
           list(slot ORDER BY i) AS slots
    FROM {grid} GROUP BY doc_id, (i // {eff_size})::INT),
{p}bvals AS (
    SELECT doc_id, band_idx,
           list_transform(generate_series(0, {eff_size // 2 - 1}),
                          j -> slots[2*j + 1] + slots[2*j + 2] * {M32}) AS vals
    FROM {p}bslots),
{p}bstate AS (
    SELECT doc_id, band_idx,
           list_reduce(list_prepend(0::HUGEINT, vals),
                       (acc, v) -> {_lo64mul(f'((acc + v) % {M64})', str(K))}) AS state
    FROM {p}bvals),
{p}bh AS MATERIALIZED (SELECT doc_id, band_idx, {_rotl('state')} AS band_hash FROM {p}bstate)"""


def minhash_dup_flags_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_minhash_dup_flags: one-shot flag = shares >=1
    (band_idx, band_hash) bucket with another row (one_shot.rs:294-332)."""
    return f"""
WITH {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
{rminhash_slot_ctes(cfg)},
{band_hash_ctes(cfg, fold=1)},
sized AS (
    SELECT doc_id,
           count(*) OVER (PARTITION BY band_idx, band_hash) AS bucket_size
    FROM bh)
SELECT doc_id, bool_or(bucket_size >= 2) AS is_dup
FROM sized GROUP BY doc_id ORDER BY doc_id"""


def simhash_dup_flags_sql(cfg: RensaConfig, n_chunks: int = 4) -> str:
    """Oracle for _q_simhash_dup_flags: 64-bit simhash (bit j set iff
    2 * #tokens-with-bit-j > token count, kernels/simhash.py), split into
    ``n_chunks`` equal bit chunks, flag = any shared (chunk, value) bucket.
    Powers of two ride as an inlined VALUES table — DuckDB power() returns
    DOUBLE, which would break exact u64 arithmetic."""
    bits = 64 // n_chunks
    pow2 = ", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    return f"""
WITH {shingle_hash_ctes(cfg)},
pow2 AS (SELECT * FROM (VALUES {pow2}) AS _b(j, p)),
bitsum AS (
    SELECT h2.doc_id, b.j,
           sum(((h2.h // b.p) % 2)::BIGINT) AS ones,
           count(*) AS n,
           max(b.p) AS p
    FROM hashes h2 CROSS JOIN pow2 b
    GROUP BY h2.doc_id, b.j),
docsim AS (
    SELECT d.doc_id,
           coalesce(s.sig, 0::HUGEINT) AS sig
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN (SELECT doc_id,
                      sum(CASE WHEN ones * 2 > n THEN p ELSE 0::HUGEINT END)::HUGEINT AS sig
               FROM bitsum GROUP BY doc_id) s ON s.doc_id = d.doc_id),
chunks AS (
    SELECT doc_id, c.band_idx,
           (sig // cp.p) % {1 << bits} AS band_hash
    FROM docsim
    CROSS JOIN (SELECT unnest(generate_series(0, {n_chunks - 1})) AS band_idx) c
    JOIN pow2 cp ON cp.j = c.band_idx * {bits}),
sized AS (
    SELECT doc_id,
           count(*) OVER (PARTITION BY band_idx, band_hash) AS bucket_size
    FROM chunks)
SELECT doc_id, bool_or(bucket_size >= 2) AS is_dup
FROM sized GROUP BY doc_id ORDER BY doc_id"""


def simhash_near_pairs_sql(cfg: RensaConfig, n_chunks: int = 4,
                           max_hamming: int = 3) -> str:
    """Oracle for _q_simhash_near_pairs: pairs sharing >=1 simhash chunk
    with xor-popcount <= max_hamming (exactly the operator's definition;
    complete for max_hamming < n_chunks by pigeonhole). popcount runs on
    two 32-bit halves — DuckDB bit_count is not defined on HUGEINT."""
    bits = 64 // n_chunks
    pow2 = ", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    x = "xor(sa.sig, sb.sig)"
    ham = (
        f"(bit_count(({x} % {M32})::BIGINT) + bit_count(({x} // {M32})::BIGINT))"
    )
    return f"""
WITH {shingle_hash_ctes(cfg)},
pow2 AS (SELECT * FROM (VALUES {pow2}) AS _b(j, p)),
bitsum AS (
    SELECT h2.doc_id, b.j,
           sum(((h2.h // b.p) % 2)::BIGINT) AS ones,
           count(*) AS n,
           max(b.p) AS p
    FROM hashes h2 CROSS JOIN pow2 b
    GROUP BY h2.doc_id, b.j),
docsim AS MATERIALIZED (
    SELECT d.doc_id,
           coalesce(s.sig, 0::HUGEINT) AS sig
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN (SELECT doc_id,
                      sum(CASE WHEN ones * 2 > n THEN p ELSE 0::HUGEINT END)::HUGEINT AS sig
               FROM bitsum GROUP BY doc_id) s ON s.doc_id = d.doc_id),
chunks AS MATERIALIZED (
    SELECT doc_id, c.band_idx,
           (sig // cp.p) % {1 << bits} AS band_hash
    FROM docsim
    CROSS JOIN (SELECT unnest(generate_series(0, {n_chunks - 1})) AS band_idx) c
    JOIN pow2 cp ON cp.j = c.band_idx * {bits}),
cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM chunks x JOIN chunks y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
     AND x.doc_id < y.doc_id)
SELECT c.a, c.b, {ham}::BIGINT AS hamming
FROM cand c
JOIN docsim sa ON sa.doc_id = c.a
JOIN docsim sb ON sb.doc_id = c.b
WHERE {ham} <= {max_hamming}
ORDER BY a, b"""


# ----------------------------------------------------------------- Rho


def _rho_sampled_ctes(cfg: RensaConfig) -> str:
    """CTEs (assumes ``hashes``) ending in ``sampled(doc_id, h)`` — the Rho
    token-budget subsample (adaptive 3-tier rule + MidpointSampler closed
    form, rho.rs:108-130 / 297-341 / kernels/rho.py:57-123) — plus
    ``rho_counts(doc_id, n)`` with SOURCE token counts."""
    if cfg.rho_token_budget_overridden:
        # ValueError (not assert) so the guard survives `python -O`
        raise ValueError(
            "generated sampling SQL encodes the default 3-tier budget rule; "
            "regenerate for overridden token budgets"
        )
    short_thr = DEFAULT_RHO_SHORT_FULL_TOKEN_THRESHOLD
    med_thr = cfg.rho_medium_token_threshold
    med_budget = cfg.rho_medium_token_budget
    default_budget = cfg.default_token_budget or 0
    return f"""
hlists AS MATERIALIZED (
    SELECT doc_id, list(h ORDER BY ord) AS hs, count(*) AS n
    FROM hashes GROUP BY doc_id),
budgeted AS (
    SELECT doc_id, hs, n,
           CASE WHEN n <= {short_thr} THEN 0
                WHEN n <= {med_thr} THEN {med_budget}
                ELSE {default_budget} END AS lim
    FROM hlists),
samp AS (
    SELECT doc_id, n,
           CASE WHEN lim = 0 OR n <= lim THEN hs
                ELSE list_transform(generate_series(0, lim - 1),
                     j -> hs[1 + (n // lim) // 2 + j * (n // lim)
                            + ((CASE WHEN (n // lim) % 2 = 0 THEN n % lim
                                     ELSE lim + (n % lim) END)
                               + j * 2 * (n % lim)) // (2 * lim)])
                END AS shs
    FROM budgeted),
rho_counts AS (SELECT doc_id, n FROM samp),
sampled AS MATERIALIZED (SELECT doc_id, unnest(shs) AS h FROM samp)"""


def _rho_mixer_ctes(cfg: RensaConfig) -> str:
    """CTEs (assumes ``sampled``) ending in ``probes(doc_id, bucket, value)``:
    the 4-probe splitmix64 mixer chain (rho.rs:509-533), bucket = mixed %
    num_perm, value = mixed >> 32."""
    if cfg.rho_adaptive_probes:
        raise ValueError(
            "generated mixer SQL uses ONE probe count for all rows; "
            "rho_adaptive_probes (per-row probe counts) needs conditional SQL"
        )
    salts = [0x517CC1B727220A95, 0x6EED0E9DA4D94A4F, 0x9E3779B97F4A7C15,
             0xBF58476D1CE4E5B9]
    seed = cfg.seed & ((1 << 64) - 1)
    c0 = seed ^ salts[0]
    probes = min(max(cfg.rho_probes, 1), 4)
    # stage each mix step as its own CTE so _sm64 args stay short column refs
    ctes = ["mix0 AS (SELECT doc_id, " + _sm64(_xor("h", str(c0))) + " AS m0 FROM sampled)"]
    for p in range(1, probes):
        ctes.append(
            f"mix{p} AS (SELECT *, "
            + _sm64(_xor(f"m{p - 1}", str(salts[p & 3])))
            + f" AS m{p} FROM mix{p - 1})"
        )
    unpivot = " UNION ALL ".join(
        f"SELECT doc_id, (m{p} % {cfg.num_perm})::BIGINT AS bucket, (m{p} // {M32}) AS value FROM mix{probes - 1}"
        for p in range(probes)
    )
    return ",\n".join(ctes) + f",\nprobes AS MATERIALIZED ({unpivot})"


def rho_sidecar_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_rho_sidecar: per-doc source shingle count (saturated
    u16), non-empty bucket count after the 4-probe scatter, and the sparse
    flag (non_empty < occupancy threshold) — rho.rs:1118-1120, 132-144."""
    thr = cfg.sparse_occupancy_threshold
    return f"""
WITH {shingle_hash_ctes(cfg)},
{_rho_sampled_ctes(cfg)},
{_rho_mixer_ctes(cfg)},
occ AS (
    -- a bucket whose min value is exactly u32::MAX is indistinguishable
    -- from EMPTY_BUCKET in the kernel (rminhash.rs:86), so it does not
    -- count as occupied
    SELECT doc_id, count(DISTINCT bucket) AS non_empty
    FROM probes WHERE value <> {M32 - 1} GROUP BY doc_id)
SELECT d.doc_id,
       least(coalesce(c.n, 0), 65535)::BIGINT AS shingle_count,
       coalesce(o.non_empty, 0)::BIGINT AS non_empty,
       coalesce(o.non_empty, 0) < {thr} AS is_sparse
FROM documents d
LEFT JOIN rho_counts c ON c.doc_id = d.doc_id
LEFT JOIN occ o ON o.doc_id = d.doc_id
ORDER BY d.doc_id"""


def bpe_piece_counts_sql() -> str:
    """Oracle for _q_bpe_piece_counts. The Spark operator splits lower(text)
    on whitespace and letter/digit/punct class transitions (lookaround
    regex, textops.py:bpe_piece_count); the piece count therefore equals the
    number of maximal runs of [a-z]+, [0-9]+, or [^a-z0-9\\s]+ — directly
    countable with regexp_extract_all (no lookarounds needed)."""
    return """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+'))::BIGINT AS n_pieces
FROM documents ORDER BY doc_id"""


def minhash_clusters_sql(
    cfg: RensaConfig, src: str = "documents", pre_ctes: str = ""
) -> str:
    """Oracle for _q_minhash_clusters: candidate pairs = docs sharing >=1
    (band_idx, band_hash) bucket; edges = pairs with signature equal-slot
    fraction >= threshold; clusters = connected components via recursive
    reachability (exact — component sizes are small at oracle SF); survivor
    = min doc_id per component. Identical-signature collapse and the hot-
    bucket star cap in the Spark plan are component-preserving rewrites, so
    components match this direct definition (operators/dedup.py:97-115).

    ``src``/``pre_ctes`` let a composite pipeline run the same clustering
    over a FILTERED doc set (pre_ctes must end with a CTE named ``src``
    exposing (doc_id, text))."""
    thr = cfg.threshold
    pre = f"{pre_ctes}," if pre_ctes else ""
    return f"""
WITH RECURSIVE {pre}
{shingle_hash_ctes(cfg, src=src)},
docs AS (SELECT doc_id FROM {src}),
{rminhash_slot_ctes(cfg)},
{band_hash_ctes(cfg, fold=1)},
cand AS MATERIALIZED (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bh x JOIN bh y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
     AND x.doc_id < y.doc_id),
siglist AS MATERIALIZED (
    SELECT doc_id, list(slot ORDER BY i) AS sl FROM grid GROUP BY doc_id),
verified AS MATERIALIZED (
    SELECT c.a, c.b
    FROM cand c
    JOIN siglist sa ON sa.doc_id = c.a
    JOIN siglist sb ON sb.doc_id = c.b
    WHERE len(list_filter(generate_series(1, {cfg.num_perm}),
                          k -> sa.sl[k] = sb.sl[k]))::DOUBLE
          / {cfg.num_perm} >= {thr}),
sym AS (
    SELECT a, b FROM verified
    UNION ALL SELECT b, a FROM verified),
reach(v, u) AS (
    SELECT doc_id, doc_id FROM docs
    UNION
    SELECT r.v, e.b FROM reach r JOIN sym e ON r.u = e.a)
SELECT v AS doc_id,
       min(u)::BIGINT AS cluster_id,
       v = min(u) AS is_survivor
FROM reach GROUP BY v ORDER BY v"""


def multimodal_clusters_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_multimodal_clusters: duplicate edges are the UNION of
    equal-phash groups and verified MinHash caption pairs; clusters via
    recursive reachability, survivor = min key
    (operators/dedup.py:multimodal_dedup_clusters).

    phash derivation (round-3 verdict ask #3): a CAPTION-INDEPENDENT
    planted stand-in — doc_ids ending in 0/1 form phash pairs
    (phash = doc_id - doc_id%2), everyone else gets a unique phash
    (= doc_id; the two value domains cannot collide since pair values are
    ==0 mod 10 and singleton values are 2..9 mod 10). ~20% of docs gain a
    phash-only edge to a doc with a DIFFERENT caption, so a broken
    phash-union branch changes this lane's value hash — the old
    phash := caption-fingerprint derivation made the lane provably
    identical to minhash_clusters."""
    thr = cfg.threshold
    return f"""
WITH RECURSIVE {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
{rminhash_slot_ctes(cfg)},
{band_hash_ctes(cfg, fold=1)},
cand AS MATERIALIZED (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bh x JOIN bh y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
     AND x.doc_id < y.doc_id),
siglist AS MATERIALIZED (
    SELECT doc_id, list(slot ORDER BY i) AS sl FROM grid GROUP BY doc_id),
verified AS MATERIALIZED (
    SELECT c.a, c.b
    FROM cand c
    JOIN siglist sa ON sa.doc_id = c.a
    JOIN siglist sb ON sb.doc_id = c.b
    WHERE len(list_filter(generate_series(1, {cfg.num_perm}),
                          k -> sa.sl[k] = sb.sl[k]))::DOUBLE
          / {cfg.num_perm} >= {thr}),
fp AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 < 2 THEN doc_id - (doc_id % 2)
                ELSE doc_id END AS phash
    FROM documents),
fp_edges AS (
    SELECT min(doc_id) OVER (PARTITION BY phash) AS a, doc_id AS b FROM fp),
edges AS (
    SELECT a, b FROM verified
    UNION SELECT a, b FROM fp_edges WHERE a <> b),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
reach(v, u) AS (
    SELECT doc_id, doc_id FROM docs
    UNION
    SELECT r.v, e.b FROM reach r JOIN sym e ON r.u = e.a)
SELECT v AS doc_id,
       min(u)::BIGINT AS cluster_id,
       v = min(u) AS is_survivor
FROM reach GROUP BY v ORDER BY v"""


def add_if_unique_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_add_if_unique (sequential greedy semantics,
    src/inline_dedup/rminhash.rs:233-299): process docs in key order; keep a
    doc iff no earlier KEPT doc is an LSH candidate (shares a band bucket)
    with signature jaccard >= threshold. Computed per connected component of
    the conflict graph with an in-order list_reduce (components are small at
    oracle SF; the decision never crosses components)."""
    thr = cfg.threshold
    return f"""
WITH RECURSIVE {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
{rminhash_slot_ctes(cfg)},
{band_hash_ctes(cfg, fold=1)},
cand AS MATERIALIZED (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bh x JOIN bh y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
     AND x.doc_id < y.doc_id),
siglist AS MATERIALIZED (
    SELECT doc_id, list(slot ORDER BY i) AS sl FROM grid GROUP BY doc_id),
conflict AS MATERIALIZED (
    SELECT c.a, c.b
    FROM cand c
    JOIN siglist sa ON sa.doc_id = c.a
    JOIN siglist sb ON sb.doc_id = c.b
    WHERE len(list_filter(generate_series(1, {cfg.num_perm}),
                          k -> sa.sl[k] = sb.sl[k]))::DOUBLE
          / {cfg.num_perm} >= {thr}),
sym AS (SELECT a, b FROM conflict UNION ALL SELECT b, a FROM conflict),
reach(v, u) AS (
    SELECT doc_id, doc_id FROM docs
    UNION
    SELECT r.v, e.b FROM reach r JOIN sym e ON r.u = e.a),
comp AS (SELECT v AS doc_id, min(u) AS cid FROM reach GROUP BY v),
comp_members AS (
    SELECT cid, list(doc_id ORDER BY doc_id) AS members FROM comp GROUP BY cid),
comp_edges AS (
    SELECT cm.cid, coalesce(list([e.a, e.b]), []) AS edges
    FROM comp_members cm
    LEFT JOIN (SELECT c.a, c.b, p.cid
               FROM conflict c JOIN comp p ON p.doc_id = c.a) e ON e.cid = cm.cid
    GROUP BY cm.cid),
greedy AS (
    SELECT m.cid,
           list_reduce(
               list_prepend([]::BIGINT[], m.members_wrapped),
               (acc, x) -> CASE WHEN len(list_filter(e.edges,
                        p -> p[2] = x[1] AND list_contains(acc, p[1]))) = 0
                   THEN list_append(acc, x[1]) ELSE acc END) AS kept_keys
    FROM (SELECT cid, list_transform(members, v -> [v]) AS members_wrapped
          FROM comp_members) m
    JOIN comp_edges e ON e.cid = m.cid)
SELECT c.doc_id, list_contains(g.kept_keys, c.doc_id) AS kept
FROM comp c JOIN greedy g ON g.cid = c.cid
ORDER BY c.doc_id"""


def rho_dup_flags_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_rho_dup_flags — the full refined one-shot decision flow
    (src/lsh/one_shot.rs:78-185 / operators/lsh.py:one_shot_dup_flags_rho):

    - rho digest = per-(doc, bucket) min of the 4-probe mixer values,
      folded band hashes (fold=2 -> 4 bands of 32 slots) for the main scan,
      unfolded (8x16) for the recall rescue;
    - non-sparse members match any bucket of size >= 2; sparse members run
      the capped row-order candidate scan (first cap+1 bucket members, up to
      cap non-self checks) with the 8-slot verify signature (missing
      signature passes, equal-slot fraction >= verify threshold otherwise);
    - sparse rows need >= required_sparse band matches, others >= 1;
    - zero-match non-sparse rows with token_count in the rescue window get a
      second chance over unfolded bands (>= rescue_required matches).
    """
    fold = cfg.effective_band_fold(True, False)
    if not (cfg.rho_recall_rescue_enabled and fold > 1):
        raise ValueError(
            "generated refined-flow SQL applies the recall rescue "
            "unconditionally; the Spark operator gates it on "
            "rho_recall_rescue_enabled and fold > 1 — regenerate for that config"
        )
    if not (cfg.rho_sparse_verify_enabled and cfg.sparse_verify_perm_clamped > 0):
        raise ValueError(
            "generated refined-flow SQL assumes sparse verify is active"
        )
    cap = cfg.rho_sparse_verify_max_candidates
    sv_perm = cfg.sparse_verify_perm_clamped
    thr = cfg.rho_sparse_verify_threshold
    occ_thr = cfg.sparse_occupancy_threshold
    seeds = ", ".join(
        f"({i}, {sparse_verify_seed(cfg, i)}::HUGEINT)" for i in range(sv_perm)
    )
    empty_sig = "[" + ", ".join([str(M32 - 1)] * sv_perm) + "]"
    return f"""
WITH {shingle_hash_ctes(cfg)},
{_rho_sampled_ctes(cfg)},
{_rho_mixer_ctes(cfg)},
rsig AS MATERIALIZED (
    SELECT doc_id, bucket, min(value) AS mn FROM probes GROUP BY doc_id, bucket),
docs AS (SELECT doc_id FROM documents),
slots_idx AS (SELECT unnest(generate_series(0, {cfg.num_perm - 1})) AS i),
grid AS MATERIALIZED (
    SELECT d.doc_id, b.i, coalesce(r.mn, {M32 - 1}) AS slot
    FROM docs d CROSS JOIN slots_idx b
    LEFT JOIN rsig r ON r.doc_id = d.doc_id AND r.bucket = b.i),
{band_hash_ctes(cfg, fold=fold)},
{band_hash_ctes(cfg, fold=1, prefix='r')},
occ AS (
    SELECT doc_id, count(DISTINCT bucket) AS non_empty
    FROM probes WHERE value <> {M32 - 1} GROUP BY doc_id),
side AS MATERIALIZED (
    SELECT d.doc_id,
           coalesce(o.non_empty, 0) < {occ_thr} AS is_sparse,
           least(coalesce(c.n, 0), 65535) AS token_count
    FROM docs d
    LEFT JOIN occ o ON o.doc_id = d.doc_id
    LEFT JOIN rho_counts c ON c.doc_id = d.doc_id),
svseeds AS (SELECT * FROM (VALUES {seeds}) AS _v(i, s)),
ssig AS MATERIALIZED (
    SELECT sa.doc_id, v.i,
           min({_sm64(_xor('sa.h', 'v.s'))} // {M32}) AS slot
    FROM sampled sa CROSS JOIN svseeds v GROUP BY sa.doc_id, v.i),
ssl AS MATERIALIZED (
    SELECT doc_id, list(slot ORDER BY i) AS lst FROM ssig GROUP BY doc_id),
ssiglist AS MATERIALIZED (
    SELECT sd.doc_id,
           CASE WHEN sd.is_sparse THEN coalesce(l.lst, {empty_sig}::HUGEINT[])
           ELSE NULL END AS sl
    FROM side sd LEFT JOIN ssl l ON l.doc_id = sd.doc_id),
brows AS MATERIALIZED (
    SELECT b.doc_id, b.band_idx, b.band_hash, s.is_sparse, g.sl
    FROM bh b JOIN side s ON s.doc_id = b.doc_id
    JOIN ssiglist g ON g.doc_id = b.doc_id),
stats AS MATERIALIZED (
    SELECT band_idx, band_hash, count(*) AS bs,
           sum(CASE WHEN is_sparse THEN 1 ELSE 0 END) AS sc
    FROM brows GROUP BY band_idx, band_hash),
ns_matches AS (
    SELECT b.doc_id, count(*) AS matches
    FROM brows b JOIN stats t
      ON t.band_idx = b.band_idx AND t.band_hash = b.band_hash AND t.bs >= 2
    WHERE NOT b.is_sparse GROUP BY b.doc_id),
ranked AS MATERIALIZED (
    SELECT b.*, row_number() OVER (
        PARTITION BY b.band_idx, b.band_hash ORDER BY b.doc_id) AS rn
    FROM brows b JOIN stats t
      ON t.band_idx = b.band_idx AND t.band_hash = b.band_hash
     AND t.bs >= 2 AND t.sc >= 1),
sp_matches AS (
    SELECT doc_id, count(*) AS matches FROM (
        SELECT me.doc_id, me.band_idx, me.band_hash,
               bool_or(
                   me.sl IS NULL OR cand.sl IS NULL
                   OR (len(me.sl) = len(cand.sl) AND len(me.sl) > 0
                       AND len(list_filter(generate_series(1, {sv_perm}),
                                           k -> me.sl[k] = cand.sl[k]))::DOUBLE
                           / len(me.sl) >= {thr})) AS band_matched
        FROM ranked me
        JOIN ranked cand
          ON cand.band_idx = me.band_idx AND cand.band_hash = me.band_hash
         AND cand.doc_id <> me.doc_id AND cand.rn <= {cap + 1}
         AND (me.rn <= {cap + 1} OR cand.rn <= {cap})
        WHERE me.is_sparse
        GROUP BY me.doc_id, me.band_idx, me.band_hash) t
    WHERE band_matched GROUP BY doc_id),
allm AS (
    SELECT s.doc_id, s.is_sparse, s.token_count,
           coalesce(m.matches, 0) AS matches,
           CASE WHEN s.is_sparse THEN {cfg.rho_sparse_required_band_matches}
                ELSE 1 END AS required
    FROM side s
    LEFT JOIN (SELECT * FROM ns_matches UNION ALL SELECT * FROM sp_matches) m
      ON m.doc_id = s.doc_id),
rhot AS (
    SELECT band_idx, band_hash FROM rbh
    GROUP BY band_idx, band_hash HAVING count(*) >= 2),
rescued AS (
    SELECT r.doc_id
    FROM rbh r
    JOIN allm a ON a.doc_id = r.doc_id
     AND a.matches = 0 AND a.required = 1
     AND a.token_count BETWEEN {cfg.rho_recall_rescue_min_tokens}
                           AND {cfg.rho_recall_rescue_max_tokens}
    JOIN rhot h ON h.band_idx = r.band_idx AND h.band_hash = r.band_hash
    GROUP BY r.doc_id
    HAVING count(*) >= {cfg.rho_recall_rescue_required_band_matches})
SELECT a.doc_id,
       (a.matches >= a.required OR re.doc_id IS NOT NULL) AS is_dup
FROM allm a LEFT JOIN rescued re ON re.doc_id = a.doc_id
ORDER BY a.doc_id"""


def sparse_verify_seed(cfg: RensaConfig, i: int) -> int:
    """Per-slot permutation seed for the Rho sparse verify signature
    (rho.rs:587-613 / kernels/rho.py:176-179)."""
    mask = (1 << 64) - 1
    return splitmix64_py(
        (cfg.seed ^ SEED1 ^ ((i * 0x9E3779B97F4A7C15) & mask)) & mask
    )


# ----------------------------------------------------------------- ANN


def _ann_common_ctes(n_planes: int, dim: int, seed: int) -> str:
    """CTEs: quantized vectors + exact-int hyperplane sign buckets.

    Planes are floor(gaussian * 2^20) int64 CONSTANTS inlined from the same
    Xoshiro stream the Spark lanes use (operators/similarity.py
    quantized_hyperplanes); vectors quantize as floor(v * 2^20) — float32
    widens to float64 exactly and the power-of-two scale is exact, so every
    sign decision is pure integer math, identical in both engines."""
    from rensa_spark.operators.similarity import QUANT_SCALE, quantized_hyperplanes

    planes = quantized_hyperplanes(dim, n_planes, seed)
    plane_rows = ", ".join(
        f"({i}, [{', '.join(str(int(v)) for v in planes[i])}]::BIGINT[])"
        for i in range(n_planes)
    )
    return f"""
planes(pidx, pv) AS (SELECT * FROM (VALUES {plane_rows}) AS _p(pidx, pv)),
vq AS MATERIALIZED (
    SELECT vec_id,
           list_transform(embedding, x -> floor(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS q
    FROM embeddings),
vn AS MATERIALIZED (
    SELECT vec_id, q,
           list_sum(list_transform(q, x -> x * x))::BIGINT AS n2
    FROM vq),
signs AS (
    SELECT v.vec_id, p.pidx,
           CASE WHEN list_sum(list_transform(generate_series(1, {dim}),
                                             i -> p.pv[i] * v.q[i]))::BIGINT > 0
                THEN (1::BIGINT << p.pidx) ELSE 0 END AS bit
    FROM vq v CROSS JOIN planes p),
buckets AS MATERIALIZED (
    SELECT vec_id, sum(bit)::BIGINT AS bucket FROM signs GROUP BY vec_id)"""


def _ann_score() -> str:
    """Fixed-shape double expression over exact integers — bit-identical to
    the Spark lanes (sqrt/mul/div each correctly rounded once)."""
    return """CASE WHEN nq.n2 > 0 AND nn.n2 > 0
           THEN (list_sum(list_transform(generate_series(1, {dim}),
                                         i -> nq.q[i] * nn.q[i]))::BIGINT)::DOUBLE
                / (sqrt(nq.n2::DOUBLE) * sqrt(nn.n2::DOUBLE))
           ELSE 0.0 END"""


def ann_topk_lsh_sql(
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    k: int = 5,
    query_filter: str = "vec_id < 3",
) -> str:
    """Oracle for _q_ann_topk_lsh: hyperplane sign buckets + 1-bit multiprobe
    (bucket plus every single-bit flip), exact fixed-point cosine re-rank
    within candidate buckets, top-k per query."""
    score = _ann_score().format(dim=dim)
    return f"""
WITH {_ann_common_ctes(n_planes, dim, seed)},
qb AS (SELECT vec_id AS qid, bucket FROM buckets WHERE {query_filter}),
probes AS (
    SELECT qid, bucket AS pb FROM qb
    UNION ALL
    SELECT qid, xor(bucket::HUGEINT, (1::BIGINT << f.p)::HUGEINT)::BIGINT
    FROM qb CROSS JOIN (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) f),
cand AS (
    SELECT p.qid, b.vec_id AS neighbor_id
    FROM probes p JOIN buckets b ON b.bucket = p.pb),
scored AS (
    SELECT c.qid, c.neighbor_id, {score} AS score
    FROM cand c
    JOIN vn nq ON nq.vec_id = c.qid
    JOIN vn nn ON nn.vec_id = c.neighbor_id)
SELECT qid, rank::BIGINT AS rank, neighbor_id FROM (
    SELECT qid, neighbor_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, neighbor_id) AS rank
    FROM scored) t
WHERE rank <= {k} ORDER BY qid, rank"""


def ann_topk_many_sql(
    n_planes: int = 6, dim: int = 64, seed: int = 42, k: int = 3
) -> str:
    """Oracle for _q_ann_topk_many: every row is a query (df<->df bucket
    equi-join semantics — same probe set as the broadcast lane)."""
    return ann_topk_lsh_sql(
        n_planes=n_planes, dim=dim, seed=seed, k=k, query_filter="TRUE"
    )


def cminhash_dup_flags_sql(cfg: RensaConfig) -> str:
    """Oracle for _q_cminhash_dup_flags: banded LSH one-shot flags over the
    C-MinHash 32-bit digest (insert_matrix takes any digest matrix,
    src/lsh/py.rs:94-108) — same band-hash fold as the minhash lane."""
    sigma_a, sigma_b, pi_c, pi_d = cminhash_params(cfg.seed)
    pre = cminhash_pi_precomputed(cfg.num_perm, pi_c, pi_d)
    pip = ", ".join(f"({k}, {int(pre[k])}::HUGEINT)" for k in range(cfg.num_perm))
    inner = f"({_lo64mul(str(sigma_a), 'h')} + {sigma_b}) % {M64}"
    return f"""
WITH {shingle_hash_ctes(cfg)},
docs AS (SELECT doc_id FROM documents),
pip AS (SELECT * FROM (VALUES {pip}) AS _p(k, pre)),
cmbase AS (SELECT doc_id, {_lo64mul(str(pi_c), f'(({inner}))')} AS base FROM hashes),
sigs AS (
    SELECT doc_id, p.k, min((base + p.pre) % {M64}) AS mn
    FROM cmbase CROSS JOIN pip p GROUP BY doc_id, p.k),
grid AS MATERIALIZED (
    SELECT d.doc_id, p.k AS i,
           coalesce(s.mn // {M32}, {M32 - 1}) AS slot
    FROM docs d CROSS JOIN pip p
    LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.k = p.k),
{band_hash_ctes(cfg, fold=1)},
sized AS (
    SELECT doc_id,
           count(*) OVER (PARTITION BY band_idx, band_hash) AS bucket_size
    FROM bh),
flags AS (SELECT doc_id, bool_or(bucket_size >= 2) AS is_dup
          FROM sized GROUP BY doc_id),
mb AS (
    -- min over the SIGNED view of the u64 band hash (Spark band_hash is
    -- int64, so its ordering differs from unsigned for hashes >= 2^63)
    SELECT doc_id,
           min(CASE WHEN band_hash >= {1 << 63} THEN band_hash - {M64}
                    ELSE band_hash END)::BIGINT AS min_band_hash
    FROM bh GROUP BY doc_id)
SELECT f.doc_id, f.is_dup, mb.min_band_hash
FROM flags f JOIN mb USING (doc_id) ORDER BY doc_id"""


def ann_near_dup_sql(
    min_cosine: float = 0.3, n_planes: int = 6, dim: int = 64, seed: int = 42
) -> str:
    """Oracle for _q_ann_near_dup: unblocked near-dup pairs — candidates
    share the full hyperplane sign bucket, verified by the exact int64
    fixed-point cosine (same quantization as the top-k ANN lanes)."""
    score = _ann_score().format(dim=dim)
    return f"""
WITH {_ann_common_ctes(n_planes, dim, seed)},
scored AS (
    SELECT bx.vec_id AS a, bz.vec_id AS b, {score} AS score
    FROM buckets bx
    JOIN buckets bz ON bz.bucket = bx.bucket AND bx.vec_id < bz.vec_id
    JOIN vn nq ON nq.vec_id = bx.vec_id
    JOIN vn nn ON nn.vec_id = bz.vec_id)
SELECT a, b, round(score, 6) AS cosine
FROM scored WHERE score >= {min_cosine} ORDER BY a, b"""


def ivf_topk_sql(
    k: int = 3,
    n_centroids: int = 16,
    n_iters: int = 5,
    n_probe: int = 2,
    dim: int = 64,
    train_sample: int = 4096,
) -> str:
    """Oracle for _q_ivf_topk: the INTEGER Lloyd's k-means coarse quantizer
    unrolled iteration by iteration (operators/similarity.ivf_train_centroids
    is a pure function of the data: exact int64 distances, argmin ties to
    the smaller centroid id, floor(sum/count) updates — integer sums are
    associative so no float-order ambiguity exists on either engine), then
    probe-2 bucket candidates ranked by exact squared L2. floor(sum::DOUBLE
    / count) is exact here (|sum| < 2^30 and quotients sit >= 1/count away
    from integers unless exact), matching Python's // floor division —
    DuckDB's ``//`` operator truncates toward zero and must NOT be used."""
    from rensa_spark.operators.similarity import QUANT_SCALE

    def dist(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {dim}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
        )

    iters = []
    prev = "c0"
    for it in range(1, n_iters + 1):
        iters.append(f"""
a{it} AS MATERIALIZED (
    SELECT vid, vq, c FROM (
        SELECT e.vid, e.vq, c.c,
               row_number() OVER (PARTITION BY e.vid
                                  ORDER BY {dist('e.vq', 'c.cv')}, c.c) AS rn
        FROM tr e CROSS JOIN {prev} c) WHERE rn = 1),
s{it} AS (
    SELECT c, pos, CAST(floor(sum(v)::DOUBLE / count(*)) AS BIGINT) AS nv
    FROM (SELECT c, unnest(vq) AS v,
                 unnest(generate_series(1, len(vq))) AS pos
          FROM a{it})
    GROUP BY c, pos),
u{it} AS (SELECT c, list(nv ORDER BY pos) AS cv FROM s{it} GROUP BY c),
c{it} AS MATERIALIZED (
    SELECT p.c, COALESCE(u.cv, p.cv) AS cv
    FROM {prev} p LEFT JOIN u{it} u USING (c))""")
        prev = f"c{it}"

    return f"""
WITH emb AS MATERIALIZED (
    SELECT vec_id AS vid,
           list_transform(embedding,
                          x -> floor(x::DOUBLE * {QUANT_SCALE})::BIGINT) AS vq
    FROM embeddings WHERE embedding IS NOT NULL),
{xxhash64_long_ctes('emb', 'vid')},
tr AS MATERIALIZED (
    -- seeded-hash sample order (ivf_train_centroids: deterministic AND
    -- unbiased, unlike an id-prefix sample)
    SELECT e.vid, e.vq, x.xxh FROM emb e JOIN xxh x USING (vid)
    ORDER BY x.xxh, e.vid LIMIT {train_sample}),
c0 AS MATERIALIZED (
    SELECT row_number() OVER (ORDER BY xxh, vid) - 1 AS c, vq AS cv
    FROM (SELECT vid, vq, xxh FROM tr ORDER BY xxh, vid LIMIT {n_centroids})),
{",".join(iters)},
probe AS MATERIALIZED (
    SELECT vid, vq, c, rn FROM (
        SELECT e.vid, e.vq, c.c,
               row_number() OVER (PARTITION BY e.vid
                                  ORDER BY {dist('e.vq', 'c.cv')}, c.c) AS rn
        FROM emb e CROSS JOIN {prev} c) WHERE rn <= {n_probe}),
home AS MATERIALIZED (
    SELECT vid AS nid, vq AS nvq, c FROM probe WHERE rn = 1),
cand AS (
    SELECT q.vid AS qid, h.nid, {dist('q.vq', 'h.nvq')} AS l2sq
    FROM (SELECT DISTINCT vid, vq, c FROM probe) q JOIN home h USING (c))
SELECT qid, nid AS neighbor_id, rank, l2sq FROM (
    SELECT qid, nid, l2sq,
           row_number() OVER (PARTITION BY qid ORDER BY l2sq, nid) AS rank
    FROM cand)
WHERE rank <= {k}
ORDER BY qid, rank"""
