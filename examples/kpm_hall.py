#!/usr/bin/env python
"""Kubo-Bastin Hall staircase of a disordered Chern insulator by KPM.

realspace.kpm_conductivity computes the full sigma(mu) curve from ONE
stochastic Chebyshev moment matrix (the T=0 Fermi integral is a single
cumulative trapezoid), with the moment recursion running as one fused
device program over the matrix-free torus Hamiltonian -- no
diagonalization anywhere.  The sigma_xy plateau at C e^2/h survives
moderate Anderson disorder even though k-space is meaningless there;
sigma_xx shows the complementary picture (insulating plateaus,
metallic peaks at the band centers).
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import realspace
from pythtb_tpu.models import library as zoo

m = zoo.haldane()
fig, axs = plt.subplots(1, 2, figsize=(9.2, 3.8), sharex=True)

for W in (0.0, 1.0, 2.5):
    s = realspace.torus_sample(m, (24, 24), onsite_disorder=W, seed=2)
    ef, sxy = realspace.kpm_conductivity(
        s, dirs=(0, 1), num_moments=512, num_vectors=8
    )
    _, sxx = realspace.kpm_conductivity(
        s, dirs=(0, 0), num_moments=512, num_vectors=8
    )
    axs[0].plot(ef, sxy, label="W = %.1f" % W)
    axs[1].plot(ef, sxx, label="W = %.1f" % W)
    ingap = sxy[np.argmin(np.abs(ef))]
    print("W = %.1f  sigma_xy(mid-gap) = %+.3f e^2/h" % (W, ingap))

axs[0].axhline(-1, color="0.7", lw=0.8)
axs[0].set(xlabel=r"$\mu$", ylabel=r"$\sigma_{xy}$ [$e^2/h$]",
           title="Hall staircase (KPM Kubo-Bastin)")
axs[1].set(xlabel=r"$\mu$", ylabel=r"$\sigma_{xx}$ [$e^2/h$]",
           title="longitudinal conductivity")
axs[0].legend()
fig.tight_layout()
fig.savefig("kpm_hall.pdf")
print("saved kpm_hall.pdf")

print("Done.")
