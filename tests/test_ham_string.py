"""hamiltonian_string round trip: the printed closed form of H(k),
evaluated as Python, must reproduce gen_ham exactly (upstream wish-list
feature /root/reference/notes/TODO:61-62)."""

import re

import numpy as np
import pytest

from pythtb_tpu.models import library as zoo

_IDX = re.compile(r"H\[(\d+)([ud]?),(\d+)([ud]?)\]")


def _eval_hs(model, k):
    s = model.hamiltonian_string(precision=15)
    nsta = model._nsta
    H = np.zeros((nsta, nsta), dtype=complex)
    ns = {"pi": np.pi, "cos": np.cos, "exp": np.exp}
    for d in range(model._dim_k):
        ns["k%d" % d] = k[d] if model._dim_k else None
    spin = {"": 0, "u": 0, "d": 1}
    for line in s.splitlines():
        if not line.strip().startswith("H["):
            continue
        left, right = line.split(" = ", 1)
        m = _IDX.match(left.strip())
        i, si, j, sj = int(m.group(1)), spin[m.group(2)], int(m.group(3)), spin[m.group(4)]
        I = i * model._nspin + si
        J = j * model._nspin + sj
        H[I, J] += eval(right, ns)
    # fill the omitted Hermitian conjugates
    out = H.copy()
    iu = np.triu_indices(nsta, k=1)
    out[(iu[1], iu[0])] = np.conj(H[iu])
    return out


@pytest.mark.parametrize(
    "model,k",
    [
        (zoo.haldane(), [0.13, -0.27]),
        (zoo.graphene(delta=0.3), [0.41, 0.09]),
        (zoo.kane_mele(), [0.21, 0.37]),
        (zoo.trestle(), [0.3]),
        (zoo.cscl(), [0.1, 0.2, 0.3]),
        (zoo.fu_kane_mele(beta=0.4), [0.05, 0.15, 0.25]),
        (zoo.molecule_nh3(), None),
    ],
)
def test_string_matches_gen_ham(model, k):
    got = _eval_hs(model, k)
    if k is None:
        want = np.asarray(model.gen_ham())
    else:
        want = np.asarray(model.gen_ham([k]))[0]
    want = want.reshape(model._nsta, model._nsta)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_string_is_readable():
    s = zoo.haldane().hamiltonian_string()
    assert "cos" in s and "exp" in s and "H[0,1]" in s
    # the three NN hops all appear in the off-diagonal entry
    line01 = [l for l in s.splitlines() if l.startswith("H[0,1]")][0]
    assert line01.count("exp") == 3
