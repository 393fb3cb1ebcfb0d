"""Device-side unitary eigenphases and general-nocc Wilson flows.

Round-1 shipped the Wilson chain product to host for
``np.linalg.eigvals`` (mirroring /root/reference/pythtb.py:3833-3838);
these tests pin the round-2 replacement: eigenphases of the unitary
product extracted ON DEVICE via simultaneous diagonalization of its
commuting Hermitian/anti-Hermitian parts
(pythtb_tpu.ops.berry.unitary_eigenphases), and the Z2 flow generalized
beyond two occupied bands.
"""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

import pythtb_tpu as ptt
from pythtb_tpu import flows
from pythtb_tpu.ops.berry import unitary_eigenphases, wilson_eigenphases

from . import zoo


def _haar(rng, n):
    z = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


def _from_phases(rng, th):
    V = _haar(rng, len(th))
    return V @ np.diag(np.exp(1j * np.array(th))) @ V.conj().T


def _multiset_err(ref, got):
    """Greedy circle-distance multiset matching of two phase lists
    (branch-insensitive: -pi and +pi are the same point)."""
    worst = 0.0
    avail = list(got)
    for want in ref:
        d = [abs(np.angle(np.exp(1j * (g - want)))) for g in avail]
        k = int(np.argmin(d))
        worst = max(worst, d[k])
        avail.pop(k)
    return worst


def _eigvals_check(U, tol=1e-10):
    import jax.numpy as jnp

    ref = np.angle(np.linalg.eigvals(U))
    got = np.asarray(unitary_eigenphases(jnp.asarray(U)))
    assert _multiset_err(ref, got) < tol


@pytest.mark.parametrize("n", [2, 3, 4, 5, 8, 16])
def test_unitary_eigenphases_haar(n):
    rng = np.random.default_rng(n)
    _eigvals_check(_haar(rng, n))


@pytest.mark.parametrize(
    "phases",
    [
        [0.7, -0.7, 2.1, -2.1],  # Kramers pairs +-theta (cos degenerate)
        [0.4, np.pi - 0.4, -1.0, np.pi + 1.0],  # equal sines theta, pi-theta
        [1.1, 1.1, 1.1, -0.3],  # triple degeneracy
        [0.0, np.pi, 0.0, -np.pi / 2],  # branch points 0 and pi
        [0.3, -0.3000001, 2.0, 1.0],  # nearly-Kramers pair
        [0.1, -0.1, np.pi - 0.1, -(np.pi - 0.1), 1.5, -1.5],  # quad symmetric
    ],
)
def test_unitary_eigenphases_adversarial(phases):
    rng = np.random.default_rng(42)
    _eigvals_check(_from_phases(rng, phases))


def test_unitary_eigenphases_batched():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    Us = np.stack([_haar(rng, 4) for _ in range(11)])
    ref = np.angle(np.linalg.eigvals(Us))
    got = np.asarray(unitary_eigenphases(jnp.asarray(Us)))
    assert max(_multiset_err(r, g) for r, g in zip(ref, got)) < 1e-10


def test_wilson_eigenphases_2x2_degenerate_accuracy():
    """The SU(2) closed form must stay eps-accurate AT degenerate
    eigenphases (the quadratic formula loses sqrt(eps) there -- observed
    as a 1.25e-8 golden miss at Kane-Mele TRIM crossings)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for th in [0.8, 1e-9, np.pi - 1e-9]:
        for split in [0.0, 1e-12, 1e-9]:
            U = _from_phases(rng, [th, th + split])
            got = np.asarray(wilson_eigenphases(jnp.asarray(U)[None]))[0]
            err = _multiset_err([th, th + split], got)
            assert err < 5e-13, (th, split, err)


def _bilayer(mod, topo_a, topo_b):
    with redirect_stdout(io.StringIO()):
        return zoo.kane_mele_bilayer(mod, topo_a, topo_b)


def test_bilayer_gap_is_open():
    """The 4-occupied-band test model must be gapped between bands 3 and
    4 everywhere (otherwise the Wilson comparisons are ill-posed)."""
    for topos in (("odd", "odd"), ("odd", "even")):
        m = _bilayer(ptt, *topos)
        evals = m.solve_all(m.k_uniform_mesh([12, 12]))
        gap = float(np.min(evals[4] - evals[3]))
        assert gap > 0.1, (topos, gap)


def test_four_band_wilson_flow_matches_reference(ref):
    """Eigenphase multisets of 4-occupied-band Wilson loops (device
    two-stage eigh path) vs the reference's np.linalg.eigvals
    (/root/reference/pythtb.py:3824-3838)."""
    m_ref = _bilayer(ref, "odd", "even")
    m_tpu = _bilayer(ptt, "odd", "even")
    with redirect_stdout(io.StringIO()):
        wr = ref.wf_array(m_ref, [13, 13])
        wr.solve_on_grid([-0.5, -0.5])
        wt = ptt.wf_array(m_tpu, [13, 13])
        wt.solve_on_grid([-0.5, -0.5])
    fr = wr.berry_phase([0, 1, 2, 3], dir=1, contin=False, berry_evals=True)
    ft = wt.berry_phase([0, 1, 2, 3], dir=1, contin=False, berry_evals=True)
    assert fr.shape == ft.shape == (13, 4)
    for row in range(fr.shape[0]):
        avail = list(ft[row])
        for want in fr[row]:
            dists = [abs(np.angle(np.exp(1j * (got - want)))) for got in avail]
            k = int(np.argmin(dists))
            assert dists[k] < 1e-9, (row, want, ft[row])
            avail.pop(k)


@pytest.mark.parametrize(
    "topos,expect",
    [(("odd", "odd"), 0.0), (("odd", "even"), 1.0), (("even", "even"), 0.0)],
)
def test_z2_four_bands(topos, expect):
    """Z2 of the 4-band occupied manifold is the mod-2 sum of the layer
    invariants (fused general-nocc device pipeline, zero host eigvals)."""
    m = _bilayer(ptt, *topos)
    z2 = flows.z2_invariant(m, occ=(0, 1, 2, 3), nk=(41, 41))
    assert z2 == expect


def test_z2_checked_fn_vmapped_mask():
    """z2_fn(check=True) evaluates coarse+fine grids in one program and
    returns a convergence mask usable under vmap."""
    import jax

    m = _bilayer(ptt, "odd", "even")
    fn, p0 = flows.z2_fn(m, occ=(0, 1, 2, 3), nk=(31, 31), check=True)
    z2, conv = jax.jit(fn)(p0)
    assert float(z2) == 1.0
    assert float(conv) == 1.0
    # vmapped over a (trivially tiled) parameter batch: shapes carry
    batch = {k: np.stack([np.asarray(v)] * 3) for k, v in p0.items()}
    z2s, convs = jax.jit(jax.vmap(fn))(batch)
    assert z2s.shape == convs.shape == (3,)
    np.testing.assert_allclose(np.asarray(z2s), 1.0)


def test_z2_odd_band_count_rejected():
    m = _bilayer(ptt, "odd", "odd")
    with pytest.raises(Exception):
        flows.z2_fn(m, occ=(0, 1, 2))


def test_wilson_flow_matches_wf_array():
    """flows.wilson_flow (one fused program) == solve_on_grid + two
    berry_phase calls, both eigenphases and traced phases, both loop
    directions."""
    import pythtb_tpu as ptt
    from pythtb_tpu import flows
    from pythtb_tpu.models import library as zoo

    km = zoo.kane_mele(esite=1.0)
    for loop_dir in (1, 0):
        wf = ptt.wf_array(km, [17, 17])
        wf.solve_on_grid([-0.5, -0.5])
        ref_ev = wf.berry_phase([0, 1], dir=loop_dir, contin=False, berry_evals=True)
        ref_tr = wf.berry_phase([0, 1], dir=loop_dir, contin=False)
        evph, traced = flows.wilson_flow(km, [0, 1], nk=(17, 17), loop_dir=loop_dir,
                                         start_k=(-0.5, -0.5))
        assert evph.shape == (17, 2) and traced.shape == (17,)
        np.testing.assert_allclose(evph, ref_ev, atol=1e-10)
        np.testing.assert_allclose(
            np.angle(np.exp(1j * (traced - ref_tr))), 0.0, atol=1e-10
        )
