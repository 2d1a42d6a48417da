"""Pallas kernels vs jnp reference implementations (SURVEY.md §4.2 'kernel
tests'): interpret=True on CPU, shape grid incl. non-divisible tile edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_tpu.kernels.coattn import cross_coattn_pallas
from score_tpu.nn.coattn import cross_coattn_ref


def _inputs(rng, B, T, n, m, d, pad_frac=0.35):
    Eu = jnp.asarray(rng.normal(size=(B, T, n, d)).astype(np.float32))
    Ei = jnp.asarray(rng.normal(size=(B, T, m, d)).astype(np.float32))
    mu = rng.random((B, T, n)) > pad_frac
    mi = rng.random((B, T, m)) > pad_frac
    mu[0, 0] = False                      # fully-padded slots
    if B > 1 and T > 1:
        mi[1, 1] = False
    Wr = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    eu = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    ei = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    return Eu, Ei, jnp.asarray(mu), jnp.asarray(mi), Wr, eu, ei


# shape grid incl. tile-edge cases: B*T below / equal / above / non-divisible
# relative to tile_g (256 default — use small shapes, the tile pads up)
SHAPES = [
    (2, 3, 5, 6, 8),       # tiny, G=6 << tile
    (4, 8, 10, 10, 16),    # paper-scale slice, G=32
    (3, 7, 9, 11, 32),     # odd everything, G=21
]


@pytest.mark.parametrize("B,T,n,m,d", SHAPES)
@pytest.mark.parametrize("pool", ["sum", "mean", "max"])
@pytest.mark.parametrize("target_aware", [True, False])
def test_coattn_kernel_matches_ref(rng, B, T, n, m, d, pool, target_aware):
    Eu, Ei, mu, mi, Wr, eu, ei = _inputs(rng, B, T, n, m, d)
    want_cu, want_ci = cross_coattn_ref(Eu, Ei, mu, mi, Wr, eu, ei,
                                        pool=pool, target_aware=target_aware)
    got_cu, got_ci = cross_coattn_pallas(Eu, Ei, mu, mi, Wr, eu, ei,
                                         pool, target_aware, True)
    np.testing.assert_allclose(np.asarray(got_cu), np.asarray(want_cu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ci), np.asarray(want_ci),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pool", ["sum", "mean", "max"])
@pytest.mark.parametrize("target_aware", [True, False])
def test_coattn_kernel_grads_match_ref(rng, pool, target_aware):
    """Gates the FUSED Pallas backward kernel (pool sum/mean; VERDICT.md r1
    #3) and the jnp-recompute fallback (max) against jax.vjp of the
    reference, on the interpret grid incl. fully-padded slots."""
    B, T, n, m, d = 2, 4, 6, 7, 16
    Eu, Ei, mu, mi, Wr, eu, ei = _inputs(rng, B, T, n, m, d)

    def loss_ref(Eu_, Ei_, Wr_, eu_, ei_):
        cu, ci = cross_coattn_ref(Eu_, Ei_, mu, mi, Wr_, eu_, ei_,
                                  pool=pool, target_aware=target_aware)
        return jnp.sum(cu ** 2) + jnp.sum(ci * cu)

    def loss_pal(Eu_, Ei_, Wr_, eu_, ei_):
        cu, ci = cross_coattn_pallas(Eu_, Ei_, mu, mi, Wr_, eu_, ei_,
                                     pool, target_aware, True)
        return jnp.sum(cu ** 2) + jnp.sum(ci * cu)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(Eu, Ei, Wr, eu, ei)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(Eu, Ei, Wr, eu, ei)
    # f32 with different reduction orders (fused kernel vs XLA): ~1e-5-scale
    # absolute noise on O(1)-O(10) grads is expected, not a math mismatch
    for gr, gp, name in zip(g_ref, g_pal, ["Eu", "Ei", "Wr", "eu", "ei"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_coattn_bwd_kernel_multi_tile(rng):
    """dWr accumulates across >1 grid tiles (G > tile_g)."""
    B, T, n, m, d = 6, 4, 3, 4, 8
    Eu, Ei, mu, mi, Wr, eu, ei = _inputs(rng, B, T, n, m, d)

    from score_tpu.kernels.coattn import _coattn_bwd_pallas
    gcu = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    gci = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    got = _coattn_bwd_pallas(Eu, Ei, mu, mi, Wr, eu, ei, gcu, gci,
                             pool="sum", target_aware=True, tile_g=8,
                             interpret=True)

    def loss(Eu_, Ei_, Wr_, eu_, ei_):
        cu, ci = cross_coattn_ref(Eu_, Ei_, mu, mi, Wr_, eu_, ei_)
        return jnp.sum(cu * gcu) + jnp.sum(ci * gci)

    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(Eu, Ei, Wr, eu, ei)
    for gp, gr, name in zip(got, want, ["Eu", "Ei", "Wr", "eu", "ei"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("n_ids", [7, 1000, 1024, 1500, 2048])
@pytest.mark.parametrize("d", [8, 32])
def test_gather_kernel_matches_take(rng, n_ids, d):
    """gather_rows_pallas == jnp.take over a shape grid incl. id counts that
    are not multiples of the 1024 tile (the pad-then-slice path)."""
    from score_tpu.kernels.gather import gather_rows_pallas
    V = 300
    table = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=(n_ids,)).astype(np.int32))
    got = gather_rows_pallas(table, ids, interpret=True)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_kernel_nd_ids(rng):
    from score_tpu.kernels.gather import gather_rows_pallas
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, size=(3, 5, 7)).astype(np.int32))
    got = gather_rows_pallas(table, ids, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)))


def test_coattn_kernel_under_jit(rng):
    B, T, n, m, d = 2, 5, 4, 6, 8
    Eu, Ei, mu, mi, Wr, eu, ei = _inputs(rng, B, T, n, m, d)
    f = jax.jit(lambda *a: cross_coattn_pallas(*a, "sum", True, True))
    got_cu, got_ci = f(Eu, Ei, mu, mi, Wr, eu, ei)
    want_cu, want_ci = cross_coattn_ref(Eu, Ei, mu, mi, Wr, eu, ei)
    np.testing.assert_allclose(np.asarray(got_cu), np.asarray(want_cu),
                               rtol=1e-5, atol=1e-5)


# --- candidates-form fused kernel (VERDICT.md r4 #1) ---

def _cand_inputs(rng, B, C, T, n, m, d, dtype=np.float32):
    Eu = jnp.asarray(rng.normal(size=(B, T, n, d)).astype(dtype))
    Ei = jnp.asarray(rng.normal(size=(B, C, T, m, d)).astype(dtype))
    mu = jnp.asarray(rng.random((B, T, n)) > 0.3)
    mi = jnp.asarray(rng.random((B, C, T, m)) > 0.3)
    # include a fully-padded slot on both sides
    mu = mu.at[0, 0].set(False)
    mi = mi.at[0, :, 1].set(False)
    Wr = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)) * 0.3
    eu = jnp.asarray(rng.normal(size=(B, d)).astype(dtype))
    ei = jnp.asarray(rng.normal(size=(B, C, d)).astype(dtype))
    return Eu, Ei, mu, mi, Wr, eu, ei


@pytest.mark.parametrize("B,C,T,n,m,d,ta",
                         [(4, 2, 3, 5, 6, 8, True),
                          (4, 2, 3, 5, 6, 8, False),
                          (3, 4, 2, 4, 3, 16, True),  # B not tile-divisible
                          (5, 1, 4, 6, 5, 8, True)])  # C == 1 (flat pairs)
def test_cand_kernel_matches_ref(rng, B, C, T, n, m, d, ta):
    from score_tpu.kernels.coattn_cand import (cross_coattn_cand,
                                               cross_coattn_cand_ref)
    Eu, Ei, mu, mi, Wr, eu, ei = _cand_inputs(rng, B, C, T, n, m, d)
    got_cu, got_ci = cross_coattn_cand(Eu, Ei, mu, mi, Wr, eu, ei,
                                       ta, 2, True)   # tile_b=2 -> multi-tile
    want_cu, want_ci = cross_coattn_cand_ref(Eu, Ei, mu, mi, Wr, eu, ei,
                                             target_aware=ta)
    np.testing.assert_allclose(np.asarray(got_cu), np.asarray(want_cu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ci), np.asarray(want_ci),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ta", [True, False])
def test_cand_kernel_grads_match_ref(rng, ta):
    """Fused backward vs jax.vjp of the plain reference — all five grads,
    multi-tile grid (dWr accumulates across revisits)."""
    from score_tpu.kernels.coattn_cand import (cross_coattn_cand,
                                               cross_coattn_cand_ref)
    B, C, T, n, m, d = 5, 2, 3, 4, 6, 8
    Eu, Ei, mu, mi, Wr, eu, ei = _cand_inputs(rng, B, C, T, n, m, d)
    dcu = jnp.asarray(rng.normal(size=(B, C, T, d)).astype(np.float32))
    dci = jnp.asarray(rng.normal(size=(B, C, T, d)).astype(np.float32))

    def k_fn(Eu_, Ei_, Wr_, eu_, ei_):
        return cross_coattn_cand(Eu_, Ei_, mu, mi, Wr_, eu_, ei_,
                                 ta, 2, True)

    def r_fn(Eu_, Ei_, Wr_, eu_, ei_):
        return cross_coattn_cand_ref(Eu_, Ei_, mu, mi, Wr_, eu_, ei_,
                                     target_aware=ta)

    _, k_vjp = jax.vjp(k_fn, Eu, Ei, Wr, eu, ei)
    _, r_vjp = jax.vjp(r_fn, Eu, Ei, Wr, eu, ei)
    got = k_vjp((dcu, dci))
    want = r_vjp((dcu, dci))
    for g, w_, name in zip(got, want, ("dEu", "dEi", "dWr", "deu", "dei")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_cand_kernel_matches_module_path(rng):
    """The kernel == the shipped CrossCoAttention candidates path (post
    target-projection contract): zero-init projections make eu/ei zero
    queries, so compare with explicit pre-projected targets instead."""
    from score_tpu.kernels.coattn_cand import (cross_coattn_cand,
                                               cross_coattn_cand_ref)
    from score_tpu.nn import coattn as ca
    B, C, T, n, m, d = 4, 2, 3, 5, 6, 8
    Eu, Ei, mu, mi, Wr, eu, ei = _cand_inputs(rng, B, C, T, n, m, d)
    # module with target_aware=False takes raw eu/ei -> matches the kernel's
    # non-target form; target terms are covered by the ref tests above
    mod = ca.CrossCoAttention(pool="sum", target_aware=False)
    params = mod.init(jax.random.PRNGKey(0), Eu, Ei, mu, mi, eu, ei)
    params = jax.tree.map(lambda x: x, params)
    params["params"]["wr"] = Wr
    want_cu, want_ci = mod.apply(params, Eu, Ei, mu, mi, eu, ei)
    got_cu, got_ci = cross_coattn_cand(Eu, Ei, mu, mi, Wr, eu, ei,
                                       False, 2, True)
    np.testing.assert_allclose(np.asarray(got_cu), np.asarray(want_cu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ci), np.asarray(want_ci),
                               rtol=1e-5, atol=1e-5)
