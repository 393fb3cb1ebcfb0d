#!/usr/bin/env python
"""Fu-Kane-Mele 3-D strong topological insulator: plane-resolved Z2
from Wilson-loop (hybrid Wannier) flows.

Beyond-reference showcase: uses the packaged model zoo and the batched
Wilson engine to diagnose the strong topological phase of the
diamond-lattice FKM model (PRL 98, 106803 (2007)).  At the two
time-reversal-invariant planes k3 = 0 and k3 = 1/2 the Wannier flows
differ in their partner-switching character -- the hallmark of a strong
TI.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models, wf_array

m = models.fu_kane_mele(t=1.0, soc=0.125)  # dt<0 default: strong TI

fig, axs = plt.subplots(1, 2, figsize=(7.5, 3.2), sharey=True)
for panel, k3 in enumerate([0.0, 0.5]):
    plane = m.reduce_dim(2, k3)  # freeze the third reduced k-component
    wf = wf_array(plane, [31, 31])
    wf.solve_on_grid([-0.5, -0.5])
    flow = wf.berry_phase([0, 1], dir=1, contin=False, berry_evals=True)
    ky = np.linspace(-0.5, 0.5, flow.shape[0])
    for shift in (-2 * np.pi, 0.0, 2 * np.pi):
        axs[panel].plot(ky, (flow[:, 0] + shift) / (2 * np.pi), "k.", ms=3)
        axs[panel].plot(ky, (flow[:, 1] + shift) / (2 * np.pi), "k.", ms=3)
    axs[panel].set(
        title=r"$k_3 = %.1f$" % k3, xlabel=r"$k_2$", ylim=(-0.5, 0.5),
        xlim=(-0.5, 0.5),
    )
    z2 = flows.z2_invariant(plane, (0, 1), nk=(31, 31))
    print("k3=%.1f plane: Z2 = %.0f" % (k3, z2))
axs[0].set_ylabel("Wannier center along $k_1$")
fig.suptitle("Fu-Kane-Mele: plane-resolved Wilson flows (strong TI)")
fig.tight_layout()
fig.savefig("fkm_z2.png")
print("Done.")
