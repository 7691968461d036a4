"""Sobol quasi-Monte-Carlo, TPU-native.

The reference vendors two CPU Sobol generators — Burkardt's table-driven
i4/i8 implementation (include/sobol/sobol.cpp) and Joe–Kuo's gray-code
generator driven by a direction-numbers file (include/sobol_joekuo/
sobol.cc:74-166) — but never wires either into the simulators
(src/simulations.cu:136-137 is a TODO). Here Sobol is a first-class sampler.

Three deliberate design departures from the reference:

1. **Direction numbers are generated, not vendored.** Primitive polynomials
   over GF(2) are found algorithmically (order test on x in GF(2^d)) and
   initial direction values are deterministic pseudo-random odd integers
   from a fixed seed. Every 1-D projection is then an exact (0,1)-sequence
   in base 2 regardless of the initial values, and the default random
   digital shift removes any residual cross-dimension artifacts. No
   upstream data tables are copied.

2. **Random access instead of the serial gray-code recurrence.** Point i is
   the XOR of direction numbers over the set bits of gray(i) = i ^ (i >> 1)
   — a 32-step branch-free select/XOR chain on the VPU — so any path/chip
   can compute its own points with no sequential dependence (the serial
   recurrence of sobol.cc:117-165 cannot shard).

3. **Scrambling.** A per-seed random digital shift (XOR) per dimension makes
   repeated runs independent and unbiased while preserving the net
   structure. Pass a zero scramble key for the raw sequence (used by the
   tests to cross-check against the C++ generator in csrc/).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MAX_DEGREE = 14  # degrees 2..14 yield 2864 dims + dim 0 => up to 2865 dims
_M_SEED = 0x5350_4F42  # deterministic seed for initial direction values

# ---------------------------------------------------------------------------
# GF(2) polynomial arithmetic on int bitmasks (host, setup-time only).
# ---------------------------------------------------------------------------


def _gf2_mulmod(a: int, b: int, p: int, d: int) -> int:
    """(a*b) mod p over GF(2), p of degree d."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> d & 1:
            a ^= p
    return r


def _gf2_powmod(a: int, e: int, p: int, d: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _gf2_mulmod(r, a, p, d)
        a = _gf2_mulmod(a, a, p, d)
        e >>= 1
    return r


def _prime_factors(n: int):
    out = []
    f = 2
    while f * f <= n:
        if n % f == 0:
            out.append(f)
            while n % f == 0:
                n //= f
        f += 1
    if n > 1:
        out.append(n)
    return out


def _primitive_polys_of_degree(d: int):
    """All primitive polynomials of degree d over GF(2), as bitmasks
    (bit i = coefficient of x^i), in increasing numeric order."""
    order = (1 << d) - 1
    cofactors = [order // q for q in _prime_factors(order)]
    out = []
    # constant term must be 1; total weight must be odd (else divisible by x+1)
    for mask in range((1 << d) | 1, 1 << (d + 1), 2):
        if bin(mask).count("1") % 2 == 0:
            continue
        if _gf2_powmod(2, order, mask, d) != 1:  # x^order != 1 => not even irreducible-with-primitive-x
            continue
        if any(_gf2_powmod(2, c, mask, d) == 1 for c in cofactors):
            continue
        out.append(mask)
    return out


@lru_cache(maxsize=1)
def primitive_polynomials() -> np.ndarray:
    """uint32 bitmasks of primitive polynomials, degrees 2..MAX_DEGREE,
    ordered by (degree, mask). Cached on disk after first computation."""
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"_sobol_polys_d{MAX_DEGREE}.npy",
    )
    if os.path.exists(cache):
        return np.load(cache)
    polys = []
    for d in range(2, MAX_DEGREE + 1):
        polys.extend(_primitive_polys_of_degree(d))
    arr = np.asarray(polys, np.uint32)
    try:
        np.save(cache, arr)
    except OSError:
        pass
    return arr


def _poly_degree(mask: int) -> int:
    return mask.bit_length() - 1


@lru_cache(maxsize=32)
def direction_numbers(dims: int) -> np.ndarray:
    """(dims, 32) uint32 direction numbers V[d][k] for bit k (MSB-scaled:
    point = XOR of V over set bits of gray(i), as a 0.32 fixed-point)."""
    polys = primitive_polynomials()
    if dims - 1 > len(polys):
        raise ValueError(
            f"sobol: {dims} dims requested, only {len(polys) + 1} supported"
        )
    rng = np.random.default_rng(_M_SEED)
    v = np.zeros((dims, 32), np.uint32)
    # dimension 0: van der Corput — m_k = 1 for all k
    v[0] = np.uint32(1) << (31 - np.arange(32, dtype=np.uint32))
    for dim in range(1, dims):
        p = int(polys[dim - 1])
        s = _poly_degree(p)
        # initial values: m_i odd, uniform in [1, 2^i)
        m = [int(rng.integers(0, 1 << max(i - 1, 0))) * 2 + 1
             for i in range(1, s + 1)]
        for k in range(s, 32):
            new = m[k - s] ^ (m[k - s] << s)
            for j in range(1, s):
                if (p >> (s - j)) & 1:
                    new ^= m[k - j] << j
            m.append(new & 0xFFFFFFFF)
        mk = np.asarray(m[:32], np.uint64)
        v[dim] = (mk << (31 - np.arange(32, dtype=np.uint64))).astype(
            np.uint32
        )
    return v


# ---------------------------------------------------------------------------
# Device-side point generation.
# ---------------------------------------------------------------------------


def digital_shift(scramble_key, dims: int) -> jax.Array:
    """(dims,) uint32 per-dimension XOR shift; all-zeros for a zero key."""
    bits = jax.random.bits(scramble_key, (dims,), jnp.uint32)
    is_zero = jnp.all(
        jax.random.key_data(scramble_key) == 0
    )
    return jnp.where(is_zero, jnp.uint32(0), bits)


def sobol_bits(direction, index) -> jax.Array:
    """Raw Sobol integers for sequence positions ``index``.

    direction: (dims, 32) uint32. index: (...,) uint32 global positions.
    Returns (..., dims) uint32. Branch-free XOR fold over the 32 bits of
    gray(index) — vectorizes perfectly on the VPU and inside Pallas.
    """
    direction = jnp.asarray(direction, jnp.uint32)
    idx = jnp.asarray(index, jnp.uint32)
    gray = idx ^ (idx >> jnp.uint32(1))
    acc = jnp.zeros(idx.shape + (direction.shape[0],), jnp.uint32)
    for b in range(32):
        bit = ((gray >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.bool_)
        acc = jnp.where(bit[..., None], acc ^ direction[:, b], acc)
    return acc


def sobol_points_f32(direction, first_index, n: int, dims: int,
                     scramble_key=None) -> jax.Array:
    """(n, dims) scrambled Sobol points in [0, 1), float32.

    ``first_index`` may be traced (global path offset); ``n``/``dims`` are
    static. The reference's equivalent is sobol_points (sobol_joekuo/
    sobol.cc:74-166), which is serial and host-only.
    """
    direction = jnp.asarray(direction, jnp.uint32)[:dims]
    idx = jnp.asarray(first_index, jnp.uint32) + jnp.arange(
        n, dtype=jnp.uint32
    )
    bits = sobol_bits(direction, idx)
    if scramble_key is not None:
        bits = bits ^ digital_shift(scramble_key, dims)[None, :]
    # u32 -> [0,1): same 2^-32 scale the reference kernels use.
    return bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
