"""Real-pair complex ops vs numpy complex references (the TPU backend has
no complex64, so all multi-channel math routes through aps_tpu/ops/
cplx_pair — these tests pin its numerics to numpy's complex linalg)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.ops import cplx_pair as cp


@pytest.fixture()
def herm(rng):
    C = 4
    a = rng.standard_normal((5, 7, C, C)) + \
        1j * rng.standard_normal((5, 7, C, C))
    return a @ a.conj().swapaxes(-1, -2) + 0.5 * np.eye(C)


def _pair(z):
    return jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag,
                                                         jnp.float32)


def test_chol_solve_matches_numpy(rng, herm):
    B = rng.standard_normal((5, 7, 4, 3)) + \
        1j * rng.standard_normal((5, 7, 4, 3))
    xr, xi = cp.chol_solve_hermitian(_pair(herm), _pair(B))
    ref = np.linalg.solve(herm, B)
    np.testing.assert_allclose(np.asarray(xr) + 1j * np.asarray(xi), ref,
                               atol=1e-4)


def test_inv_matches_numpy(rng, herm):
    ir, ii = cp.inv_hermitian(_pair(herm))
    np.testing.assert_allclose(np.asarray(ir) + 1j * np.asarray(ii),
                               np.linalg.inv(herm), atol=1e-4)


def test_logdet_matches_numpy(rng, herm):
    ld = cp.logdet_hermitian(_pair(herm))
    _, ref = np.linalg.slogdet(herm)
    np.testing.assert_allclose(np.asarray(ld), ref, atol=1e-4)


def test_ceinsum_matches_numpy(rng):
    a = rng.standard_normal((3, 5, 8)) + 1j * rng.standard_normal((3, 5, 8))
    b = rng.standard_normal((3, 6, 8)) + 1j * rng.standard_normal((3, 6, 8))
    er, ei = cp.ceinsum("...it,...jt->...ij", _pair(a), cp.conj(_pair(b)))
    ref = np.einsum("...it,...jt->...ij", a, b.conj())
    np.testing.assert_allclose(np.asarray(er) + 1j * np.asarray(ei), ref,
                               atol=1e-4)


def test_packed_ipd_matches_angle_path(rng):
    """PackedIpdTransform (trig identity, no arctan2) == the angle-based
    IpdTransform pipeline."""
    import jax

    from aps_tpu.transform.enh import (IpdTransform, PackedIpdTransform,
                                       PhaseTransform)
    packed = jnp.asarray(rng.standard_normal((2, 3, 257, 11, 2)),
                         jnp.float32)
    for cos, sin in [(True, False), (True, True)]:
        fast = PackedIpdTransform(ipd_index="0,1;0,2", cos=cos, sin=sin)
        out_fast = fast.apply(fast.init(jax.random.PRNGKey(0), packed),
                              packed)
        phase = PhaseTransform(dim=-1)
        p = phase.apply(phase.init(jax.random.PRNGKey(0), packed), packed)
        p = jnp.swapaxes(p, -1, -2)  # N x C x T x F
        ref_t = IpdTransform(ipd_index="0,1;0,2", cos=cos, sin=sin)
        out_ref = ref_t.apply(ref_t.init(jax.random.PRNGKey(0), p), p)
        np.testing.assert_allclose(np.asarray(out_fast),
                                   np.asarray(out_ref), atol=2e-5)


def test_mvdr_weight_matches_numpy_complex(rng):
    """The full MVDR weight derivation (covariances + hermitian solve +
    trace normalization) against a straight numpy complex implementation."""
    import jax

    from aps_tpu.asr.filter.mvdr import MvdrBeamformer

    N, C, F, T = 2, 3, 17, 9
    spec = rng.standard_normal((N, C, F, T)) + \
        1j * rng.standard_normal((N, C, F, T))
    mask = rng.uniform(0.1, 0.9, (N, T, F))
    packed = jnp.asarray(
        np.stack([spec.real, spec.imag], -1), jnp.float32)
    bf = MvdrBeamformer(num_bins=F, att_dim=8, mask_norm=False, eps=1e-5)
    variables = bf.init(jax.random.PRNGKey(0), jnp.asarray(mask), packed)
    out = bf.apply(variables, jnp.asarray(mask, jnp.float32), packed)
    # numpy reference with the SAME attention params
    m = np.swapaxes(mask, 1, 2)  # N x F x T
    spec_f = np.swapaxes(spec, 1, 2)  # N x F x C x T
    def covar(mk):
        nom = np.einsum("...it,...jt->...ij", spec_f * mk[:, :, None, :],
                        spec_f.conj())
        den = np.maximum(mk.sum(-1)[..., None, None], 1e-7)
        return nom / den
    Rs, Rn = covar(m), covar(1 - m)
    # channel attention (reuse the module's params through its submodule)
    from aps_tpu.asr.filter.mvdr import ChannelAttention
    att = ChannelAttention(F, 8)
    u = np.asarray(att.apply({"params": variables["params"]["ref"]},
                             (jnp.asarray(Rs.real, jnp.float32),
                              jnp.asarray(Rs.imag, jnp.float32))))
    Rn = Rn + np.eye(C) * 1e-5
    RnRs = np.linalg.solve(Rn, Rs)
    tr = np.trace(RnRs, axis1=-2, axis2=-1) + 1e-5
    w = np.einsum("nfij,nj->nfi", RnRs, u) / tr[..., None]
    beam = np.einsum("nfc,ncft->nft", w.conj(), spec)  # N x F x T
    ref = np.swapaxes(beam, 1, 2)  # N x T x F
    got = np.asarray(out[..., 0]) + 1j * np.asarray(out[..., 1])
    np.testing.assert_allclose(got, ref, atol=1e-3)
