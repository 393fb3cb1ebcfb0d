#!/usr/bin/env python
"""Axion angle of the Fu-Kane-Mele strong TI by gauge-free pumping.

Beyond-reference showcase: theta (the Chern-Simons magnetoelectric
coupling) is computed WITHOUT ever fixing a gauge, by integrating the
4D projector-curvature second-Chern density along the model's
TR-breaking beta family (Essin-Moore-Vanderbilt PRL 102, 146805
(2009)) from the strong-TI point to the TR-restored trivial endpoint
at beta = pi.  The same density around the CLOSED beta cycle gives the
quantized axion pump C2 = -1 (theta winds by 2 pi C2 per cycle).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models

# quantized pump around the closed cycle
L = 12
loop = [models.fu_kane_mele(beta=2 * np.pi * i / L) for i in range(L)]
c2 = flows.second_chern(loop, (0, 1), nk=(12, 12, 12))
print("closed beta-cycle second Chern number: C2 = %.3f" % c2)

# theta of the strong TI: pump to the trivial endpoint
Lp = 13
path = [models.fu_kane_mele(beta=np.pi * i / (Lp - 1)) for i in range(Lp)]
theta = flows.axion_theta(path, (0, 1), nk=(12, 12, 12))
print("theta(FKM strong) = %.4f = %.4f pi" % (theta, theta / np.pi))

# theta accumulates along the path: partial integrals
thetas = []
betas = np.linspace(0.2, np.pi, 5)
for b_end in betas:
    sub = [models.fu_kane_mele(beta=b) for b in np.linspace(0, b_end, 7)]
    # theta(target) - theta(at b_end): pump from 0 to b_end
    thetas.append(flows.axion_theta(sub, (0, 1), nk=(10, 10, 10),
                                    refine=False))
fig, ax = plt.subplots(figsize=(5.2, 3.4))
ax.plot(betas / np.pi, np.array(thetas) / np.pi, "o-")
ax.set(xlabel=r"$\beta_{\rm end}/\pi$",
       ylabel=r"$\Delta\theta(0 \to \beta_{\rm end})/\pi$",
       title="Axion pumping along the FKM TR-breaking family")
ax.axhline(1.0, color="k", lw=0.5, ls="--")
fig.tight_layout()
fig.savefig("axion_fkm.png", dpi=150)
print("Done.")
