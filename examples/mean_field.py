#!/usr/bin/env python
"""Self-consistent mean field: Hubbard magnetism and BCS pairing.

Three panels, all driven by the one-program device fixed points in
pythtb_tpu.meanfield (capabilities the reference does not have --
pythtb.py is strictly single-particle):

1. Honeycomb Hubbard at half filling: staggered (Neel) magnetization
   and the interaction-induced gap vs U -- the mean-field
   semimetal-to-antiferromagnet transition, with the gap tracking the
   identity gap = U |m| on a bipartite lattice.
2. Interacting topology composition: the converged Hartree-Fock fields
   come back as effective tb_models, so the Haldane model's Chern
   number can be followed INTO the interacting regime -- the AFM mean
   field acts like a sublattice mass and kills the topology at large U.
3. BCS gap on the square lattice vs attraction g, against the classic
   gap equation solved independently.
"""

import matplotlib.pyplot as plt
import numpy as np

import pythtb_tpu as ptt
from pythtb_tpu import flows, meanfield

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))

# ---- 1. honeycomb Hubbard AFM ----------------------------------------
g = ptt.models.graphene(t=-1.0)
Us = np.linspace(0.5, 5.0, 10)
ms, gaps = [], []
for U in Us:
    r = meanfield.hartree_fock(g, float(U), 2.0, nk=(18, 18), seed=3)
    ms.append(abs(r["magnetization"][0]))
    gaps.append(r["gap"])
axs[0].plot(Us, ms, "o-", label=r"$|m|$ staggered")
axs[0].plot(Us, np.asarray(gaps) / Us, "s--", label=r"gap$/U$")
axs[0].set_xlabel("U / |t|")
axs[0].set_title("honeycomb Hubbard HF")
axs[0].legend()
onset = np.asarray(ms) > 1e-3
if onset.any() and not onset[0]:
    i_on = int(np.argmax(onset))
    print("honeycomb AFM onset between U = %.2f and %.2f"
          % (Us[i_on - 1], Us[i_on]))
else:
    print("honeycomb AFM onset outside the sampled U range")

# ---- 2. interacting Chern transition ---------------------------------
h = ptt.models.haldane(delta=0.0)
Us2 = np.linspace(0.0, 6.0, 7)
cherns, mstag = [], []
for U in Us2:
    if U == 0.0:
        cherns.append(flows.chern_number(h, [0], nk=(31, 31)))
        mstag.append(0.0)
        continue
    r = meanfield.hartree_fock(h, float(U), 2.0, nk=(18, 18), seed=5)
    cherns.append(flows.chern_number(r["model_up"], [0], nk=(31, 31)))
    mstag.append(abs(r["magnetization"][0]))
axs[1].plot(Us2, np.round(cherns), "o-", label="Chern (spin up)")
axs[1].plot(Us2, mstag, "s--", label=r"$|m|$")
axs[1].set_xlabel("U / |t|")
axs[1].set_title("Haldane + Hubbard: interacting topology")
axs[1].legend()
print("Haldane Chern survives to U =",
      Us2[np.where(np.abs(np.abs(np.asarray(cherns)) - 1.0) < 0.1)[0][-1]])

# ---- 3. BCS gap vs attraction ----------------------------------------
sq = ptt.models.square(t=-1.0)
mu, kt, nk = -0.4, 0.01, 36
gs = np.linspace(1.0, 3.0, 7)
deltas = []
for gc in gs:
    rb = meanfield.bcs_gap(sq, float(gc), mu, nk=(nk, nk),
                           temperature=kt, max_iters=4000)
    deltas.append(rb["delta"][0])
ks = np.arange(nk) / nk
KX, KY = np.meshgrid(ks, ks, indexing="ij")
eps = np.asarray(sq.solve_all(np.stack([KX.ravel(), KY.ravel()], -1)))[0]


def gap_eq(gc):
    lo, hi = 1e-9, 10.0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        E = np.sqrt((eps - mu) ** 2 + mid**2)
        if np.mean(np.tanh(E / (2 * kt)) / (2 * E)) > 1.0 / gc:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


ref = [gap_eq(gc) for gc in gs]
axs[2].plot(gs, deltas, "o", label="BdG fixed point")
axs[2].plot(gs, ref, "-", label="gap equation")
axs[2].set_xlabel("g / |t|")
axs[2].set_ylabel(r"$\Delta$")
axs[2].set_title("square-lattice BCS")
axs[2].legend()
print("max |BdG - gap equation| = %.2e"
      % float(np.abs(np.asarray(deltas) - np.asarray(ref)).max()))

fig.tight_layout()
fig.savefig("mean_field.png", dpi=150)
print("saved mean_field.png")
print("Done.")
