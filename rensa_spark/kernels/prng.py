"""SplitMix64 + Xoshiro256++ and rensa's permutation-parameter derivation.

The reference derives all per-seed parameters from
``Xoshiro256PlusPlus::seed_from_u64(seed)`` (rand_xoshiro 0.7):
- R-MinHash permutations: num_perm pairs (a = next_u64() | 1, b = next_u64())
  — /root/reference/src/rminhash.rs:138-150.
- C-MinHash params: sigma_a = next|1, sigma_b = next, pi_c = next|1,
  pi_d = next — /root/reference/src/cminhash.rs:69-86.

``seed_from_u64`` fills the 32-byte xoshiro state with four successive
SplitMix64 outputs (little-endian), per the public rand_xoshiro
implementation (xoshiro crate docs / Blackman & Vigna's recommendation).
SplitMix64 itself also appears in the reference as the Rho mixer
(/root/reference/src/rminhash/rho.rs:34-39).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK64 = (1 << 64) - 1

_SM64_GAMMA = 0x9E3779B97F4A7C15
_SM64_MUL1 = 0xBF58476D1CE4E5B9
_SM64_MUL2 = 0x94D049BB133111EB


def splitmix64_py(value: int) -> int:
    """Scalar SplitMix64 mix step (pure int, for oracles and state setup)."""
    value = (value + _SM64_GAMMA) & _MASK64
    value = ((value ^ (value >> 30)) * _SM64_MUL1) & _MASK64
    value = ((value ^ (value >> 27)) * _SM64_MUL2) & _MASK64
    return value ^ (value >> 31)


def splitmix64_np(values: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 over a uint64 ndarray (rho.rs:34-39)."""
    v = values.astype(U64, copy=True)
    with np.errstate(over="ignore"):
        v += U64(_SM64_GAMMA)
        v = (v ^ (v >> U64(30))) * U64(_SM64_MUL1)
        v = (v ^ (v >> U64(27))) * U64(_SM64_MUL2)
        return v ^ (v >> U64(31))


def _rotl64(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK64


class Xoshiro256PlusPlus:
    """Pure-python Xoshiro256++ matching rand_xoshiro 0.7 seed_from_u64."""

    def __init__(self, seed: int) -> None:
        state = []
        x = seed & _MASK64
        for _ in range(4):
            x = (x + _SM64_GAMMA) & _MASK64
            z = x
            z = ((z ^ (z >> 30)) * _SM64_MUL1) & _MASK64
            z = ((z ^ (z >> 27)) * _SM64_MUL2) & _MASK64
            state.append(z ^ (z >> 31))
        self.s = state

    def next_u64(self) -> int:
        s = self.s
        result = (_rotl64((s[0] + s[3]) & _MASK64, 23) + s[0]) & _MASK64
        t = (s[1] << 17) & _MASK64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = _rotl64(s[3], 45)
        return result


def rminhash_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) uint64 arrays; a forced odd — src/rminhash.rs:138-150."""
    rng = Xoshiro256PlusPlus(seed)
    a = np.empty(num_perm, dtype=U64)
    b = np.empty(num_perm, dtype=U64)
    for i in range(num_perm):
        a[i] = rng.next_u64() | 1
        b[i] = rng.next_u64()
    return a, b


def cminhash_params(seed: int) -> tuple[int, int, int, int]:
    """(sigma_a, sigma_b, pi_c, pi_d) — src/cminhash.rs:69-86."""
    rng = Xoshiro256PlusPlus(seed)
    sigma_a = rng.next_u64() | 1
    sigma_b = rng.next_u64()
    pi_c = rng.next_u64() | 1
    pi_d = rng.next_u64()
    return sigma_a, sigma_b, pi_c, pi_d


def cminhash_pi_precomputed(num_perm: int, pi_c: int, pi_d: int) -> np.ndarray:
    """pi_precomputed[k] = pi_c*k + pi_d (wrapping) — src/cminhash/core.rs:38-46."""
    with np.errstate(over="ignore"):
        return U64(pi_c) * np.arange(num_perm, dtype=U64) + U64(pi_d)
