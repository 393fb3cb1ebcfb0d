#!/usr/bin/env python
"""Optical conductivity: graphene's universal plateau and the Haldane
magneto-optical response.

optical.optical_conductivity evaluates the full frequency-dependent
Kubo tensor in one device program (k-grid solve + analytic velocities
+ chunked frequency contraction).  Spinless graphene shows the
universal pi/4 e^2/h absorption plateau (the measured pi/2 includes
spin); the Haldane insulator shows the dc Hall quantization
sigma_xy(0) = C e^2/h and the absorption edge at the direct gap,
located independently by the joint density of states.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import optical
from pythtb_tpu.models import library as zoo

w = np.linspace(0.0, 6.0, 241)

sig_g = optical.optical_conductivity(
    zoo.graphene(), w, occ=[0], nk=(241, 241), eta=0.02
)
m = zoo.haldane()
sig_h = optical.optical_conductivity(m, w, occ=[0], nk=(161, 161), eta=0.04)
jdos = optical.joint_dos(m, w, occ=[0], nk=(161, 161), sigma=0.04)
print("graphene plateau sigma_xx(0.5) = %.3f (pi/4 = %.3f)"
      % (sig_g[0, 0].real[w.searchsorted(0.5)], np.pi / 4))
print("haldane sigma_xy(0) = %+.4f e^2/h" % sig_h[0, 1, 0].real)

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.6))
axs[0].plot(w, sig_g[0, 0].real)
axs[0].axhline(np.pi / 4, color="0.7", lw=0.8, ls="--")
axs[0].set(xlabel=r"$\omega/|t|$", ylabel=r"Re $\sigma_{xx}$ [$e^2/h$]",
           title="graphene: universal plateau")
axs[1].plot(w, sig_h[0, 0].real, label=r"Re $\sigma_{xx}$")
axs[1].plot(w, sig_h[0, 1].real, label=r"Re $\sigma_{xy}$")
axs[1].legend()
axs[1].set(xlabel=r"$\omega/|t|$", title="Haldane: magneto-optics")
axs[2].plot(w, jdos)
axs[2].set(xlabel=r"$\omega/|t|$", ylabel=r"JDOS",
           title="joint DOS (absorption phase space)")
fig.tight_layout()
fig.savefig("optical_response.pdf")
print("saved optical_response.pdf")

print("Done.")
