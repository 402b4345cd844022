"""Bit-exact, vectorized reimplementation of the reference's test-data
generator (`/root/reference/random.c`): PCG32 with the reference's fixed
seed/stream constants (`random.c:21-23` — "no option to set the seed",
`random.c:18-20`), Lemire bounded rejection (`random.c:34-44`), and the
distribution menagerie (`random.c:46-93`).

The PCG32 sequence is produced without a sequential Python loop by
log-doubling the LCG jump: if a block of k consecutive states is known, the
next k are ``A^k * states + C_k`` (one vectorized multiply-add), with
``(A_2k, C_2k) = (A_k^2, C_k*(A_k+1))``.  The Lemire rejection loop
vectorizes because a draw is rejected iff ``low32(raw*limit) < residue`` —
independent of loop context — so filtering the raw stream reproduces the
C call sequence exactly (verified against the compiled reference).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
U32 = np.uint32

PCG32_STATE = np.uint64(0x853C49E6748FEA9B)  # random.c:21
PCG32_INC = np.uint64(0xDA3E39CB94B95BDB)  # random.c:22
PCG32_MUL = np.uint64(6364136223846793005)  # random.c:23

_UINT32_MAX = float(0xFFFFFFFF)


def pcg32_states(n: int, state: np.uint64 = PCG32_STATE) -> np.ndarray:
    """First n raw LCG states (the value BEFORE each update, as pcg32() uses)."""
    if n <= 0:
        return np.empty(0, dtype=U64)
    states = np.array([state], dtype=U64)
    a_k = PCG32_MUL
    c_k = PCG32_INC
    with np.errstate(over="ignore"):  # LCG arithmetic is mod 2^64 by design
        while states.size < n:
            states = np.concatenate([states, states * a_k + c_k])
            c_k = c_k * (a_k + U64(1))
            a_k = a_k * a_k
    return states[:n]


def pcg32(n: int, state: np.uint64 = PCG32_STATE) -> np.ndarray:
    """First n pcg32() outputs (XSH-RR output function, `random.c:25-32`)."""
    raw = pcg32_states(n, state)
    xsh = (((raw >> U64(18)) ^ raw) >> U64(27)).astype(U32)
    rot = (raw >> U64(59)).astype(U32)
    return (xsh >> (rot & U32(31))) | (xsh << ((U32(0) - rot) & U32(31)))


def rand_lemire_stream(n_values: int, limit: int) -> np.ndarray:
    """First n_values outputs of rand_lemire(limit) (`random.c:34-44`),
    consuming the global PCG32 stream exactly as the C reference does."""
    limit_u = U64(limit)
    residue = U64((0x100000000 - limit) % limit)
    out = np.empty(0, dtype=U64)
    n_raw = int(n_values * 1.02) + 64
    while True:
        raws = pcg32(n_raw).astype(U64)
        num = raws * limit_u
        low = num & U64(0xFFFFFFFF)
        accepted = num[low >= residue] >> U64(32)
        if accepted.size >= n_values:
            return accepted[:n_values]
        n_raw = int(n_raw * 1.3) + 64


def harness_data(threads: int = 9, samples: int = 1_000_000, value_range: int = 1_000_000_000) -> np.ndarray:
    """The exact data array of the reference harness
    (`/root/reference/test.c:204-208`): shape (threads, samples) uint64."""
    return rand_lemire_stream(threads * samples, value_range).reshape(threads, samples)


# ------------------------------------------------------- distribution shapes
# Vectorized equivalents of random.c:46-93; each consumes a uniform stream
# derived from pcg32 exactly as rand_uniform does (divide by UINT32_MAX).


def uniforms(n: int, state: np.uint64 = PCG32_STATE) -> np.ndarray:
    return pcg32(n, state).astype(np.float64) / _UINT32_MAX


def exponential(n: int) -> np.ndarray:
    return -np.log(uniforms(n))


def pareto(n: int) -> np.ndarray:
    return 1.0 / uniforms(n) - 1.0


def gamma(n: int, k: int = 4) -> np.ndarray:
    return -np.log(uniforms(n * k)).reshape(n, k).sum(axis=1) / k


def normal(n: int) -> np.ndarray:
    """Irwin-Hall sum of 12 uniforms (`random.c:70-78`)."""
    return uniforms(n * 12).reshape(n, 12).sum(axis=1) - 6.0


def lognormal(n: int) -> np.ndarray:
    return np.exp(normal(n))


def chisquared(n: int, k: int = 4) -> np.ndarray:
    r = normal(n * k).reshape(n, k)
    return (r * r).sum(axis=1) / k
