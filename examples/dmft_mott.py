#!/usr/bin/env python
"""The Mott metal-insulator transition from single-site DMFT.

``dmft.bethe`` solves the half-filled Hubbard model on the Bethe
lattice (the canonical infinite-dimensional benchmark, where DMFT is
exact); ``dmft.solve`` runs the same cycle on any ``tb_model``
lattice through the one-program Schur-complement k-sum.  Shown here:

1. quasiparticle weight Z(U) and double occupancy d(U) across the
   transition -- the quasiparticle mass diverges (Z -> 0) while
   charge fluctuations freeze out;
2. the impurity spectral function A(w) at three interaction
   strengths: the three-peak structure (quasiparticle resonance +
   Hubbard bands) collapsing into the Mott gap;
3. hysteresis: seeding the cycle with a metallic vs an insulating
   converged Sigma inside the coexistence window gives different
   self-consistent solutions -- the first-order character of the
   T > 0 transition.
"""
import warnings

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import dmft

beta, D = 30.0, 2.0
kw = dict(D=D, beta=beta, n_matsubara=192, n_bath=4, max_iter=60)

# -- panel 1: sweep U upward, seeding each run from the previous -----
Us = np.arange(0.5, 7.01, 0.5)
Zs, ds, sols = [], [], {}
sigma = None
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    for U in Us:
        r = dmft.bethe(U, sigma0=sigma, **kw)
        sigma = r.sigma
        Zs.append(r.Z)
        ds.append(r.docc)
        sols[float(U)] = r
        print("U=%.1f  Z=%.4f  docc=%.4f  (%d it, conv=%s)"
              % (U, r.Z, r.docc, r.iterations, r.converged))

fig, axs = plt.subplots(1, 3, figsize=(13.5, 4.0))
axs[0].plot(Us, Zs, "o-", color="#1f77b4", label=r"$Z$")
axs[0].plot(Us, np.array(ds) * 4, "s-", color="#d62728",
            label=r"$4\,\langle n_\uparrow n_\downarrow\rangle$")
axs[0].set_xlabel(r"$U/t^*$")
axs[0].set_title(r"Mott transition ($\beta t^* = %g$)" % beta)
axs[0].legend()
axs[0].grid(alpha=0.3)

# -- panel 2: spectral functions across the transition ---------------
om = np.linspace(-6, 6, 1201)
for U, c in ((1.0, "#1f77b4"), (4.0, "#2ca02c"), (6.0, "#d62728")):
    A = sols[U].spectral(om, eta=0.12)
    axs[1].plot(om, A, color=c, label=r"$U = %g$" % U)
axs[1].set_xlabel(r"$\omega$")
axs[1].set_ylabel(r"$A(\omega)$")
axs[1].set_title("quasiparticle peak + Hubbard bands")
axs[1].legend()
axs[1].grid(alpha=0.3)

# -- panel 3: hysteresis inside the coexistence window ----------------
Us_h = np.arange(4.4, 5.81, 0.2)
z_up, z_dn = [], []
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    sig = sols[4.0].sigma  # metallic seed, sweep up
    for U in Us_h:
        r = dmft.bethe(U, sigma0=sig, **kw)
        sig = r.sigma
        z_up.append(r.Z)
    sig = sols[6.5].sigma  # insulating seed, sweep down
    for U in Us_h[::-1]:
        r = dmft.bethe(U, sigma0=sig, **kw)
        sig = r.sigma
        z_dn.append(r.Z)
axs[2].plot(Us_h, z_up, "o-", color="#1f77b4", label="metallic seed")
axs[2].plot(Us_h, z_dn[::-1], "s--", color="#d62728",
            label="insulating seed")
axs[2].set_xlabel(r"$U/t^*$")
axs[2].set_ylabel(r"$Z$")
axs[2].set_title("coexistence window")
axs[2].legend()
axs[2].grid(alpha=0.3)

fig.tight_layout()
fig.savefig("dmft_mott.pdf")
print("saved dmft_mott.pdf")
print("Done.")
