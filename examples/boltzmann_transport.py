#!/usr/bin/env python
"""Semiclassical transport of a magnetic Chern band (Haldane model).

``boltzmann.transport_coefficients`` evaluates the full RTA transport
set -- conductivity, Seebeck, electronic thermal conductivity, and the
low-field Hall response -- for a whole chemical-potential sweep in one
device program.  Three panels:

1. sigma_xx(mu) against the transport distribution picture: metallic
   in the bands, exponentially small in the Chern gap;
2. Seebeck S(mu): electron-like (negative) rising from the band
   bottom, diverging toward the gap edges where the carrier pockets
   empty, and odd about the particle-hole-symmetric point;
3. ordinary Hall coefficient R_H(mu): 1/(n q) in the dilute corners
   with the electron/hole sign change across each band -- distinct
   from the ANOMALOUS Hall response of flows.anomalous_hall (Berry
   curvature, no B field), which is also drawn for contrast.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as ptt
from pythtb_tpu import boltzmann, flows

m = ptt.models.haldane()
mus = np.linspace(-3.9, 3.9, 157)
r = boltzmann.transport_coefficients(m, mus, 0.08, 256, tau=1.0)

fig, axs = plt.subplots(1, 3, figsize=(13.6, 3.6))

axs[0].plot(mus, r["sigma"][:, 0, 0], "C0", lw=1.4)
axs[0].set_title("$\\sigma_{xx}(\\mu)/e^2\\tau$")
axs[0].set_xlabel("$\\mu$")
axs[0].axvspan(-0.58, 0.58, color="0.9", label="Chern gap")
axs[0].legend(fontsize=8)

axs[1].plot(mus, r["seebeck"][:, 0, 0], "C2", lw=1.4)
axs[1].set_ylim(-3, 3)
axs[1].set_title("Seebeck $S(\\mu)$ [$k_B/e$]")
axs[1].set_xlabel("$\\mu$")
axs[1].axhline(0, color="k", lw=0.5)

axs[2].plot(mus, r["hall_coefficient"], "C3", lw=1.4,
            label="ordinary $R_H$ (RTA)")
ef = np.linspace(-3.9, 3.9, 79)
ahc = flows.anomalous_hall(m, ef, nk=(101, 101))
axs[2].plot(ef, ahc, "C0--", lw=1.0, label="anomalous $\\sigma_{xy}$")
axs[2].set_ylim(-12, 12)
axs[2].set_title("ordinary vs anomalous Hall")
axs[2].set_xlabel("$\\mu$")
axs[2].legend(fontsize=8)

fig.tight_layout()
fig.savefig("boltzmann_transport.pdf")

# dilute-corner sanity: R_H n q -> -1
i = np.argmin(np.abs(mus + 3.8))
print("R_H * n * q at mu=-3.8: %.4f (parabolic limit -1)"
      % (r["hall_coefficient"][i] * r["n"][i]))
print("Done.\n")
