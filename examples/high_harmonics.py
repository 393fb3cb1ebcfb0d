#!/usr/bin/env python
"""High-harmonic generation in a gapped 2-D insulator, in real time.

``optical.harmonic_spectrum`` drives the filled bands with the EXACT
Peierls-gauge Hamiltonian H(k + A(t)) -- nonperturbative, so the same
engine covers perturbative nonlinear optics (the SHG conductivity from
the 2-omega channel at weak field) and strong-field physics (the
harmonic plateau and cutoff of solid-state HHG).

Panels: (1) weak-field harmonic comb of h-BN (even harmonics allowed
by broken inversion; the 2nd channel IS sigma^(2)); (2) strong-field
HHG spectrum with the characteristic plateau; (3) SHG dispersion
sigma^{yxx}(omega) across the transparent window.
"""
import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from pythtb_tpu import models, optical

bn = models.bn(delta=1.0)  # direct gap ~ 2.0

fig, axs = plt.subplots(1, 3, figsize=(12.5, 3.5))

# ---- weak field: perturbative comb -----------------------------------
w = 0.6
r_weak = optical.harmonic_spectrum(bn, w, 5e-3, occ=[0], nk=(36, 36),
                                   cycles=24, ramp_cycles=8,
                                   steps_per_cycle=96, n_harmonics=7)
amps = np.abs(r_weak["harmonics"]).max(axis=1)
axs[0].semilogy(np.arange(len(amps)), amps + 1e-18, "ko", ms=4)
axs[0].set_xlabel("harmonic n")
axs[0].set_ylabel(r"$|j_n|$")
axs[0].set_title("weak field: perturbative comb")
print("weak field:  |j_n| =", ["%.1e" % a for a in amps[1:6]])

# ---- strong field: HHG plateau ----------------------------------------
w_s = 0.25
r_strong = optical.harmonic_spectrum(bn, w_s, 0.6, occ=[0], nk=(48, 48),
                                     cycles=20, ramp_cycles=6,
                                     steps_per_cycle=128,
                                     n_harmonics=25)
amps_s = np.abs(r_strong["harmonics"]).max(axis=1)
axs[1].semilogy(np.arange(len(amps_s)), amps_s + 1e-18, "k.-", lw=0.7)
axs[1].axvline(2.0 / w_s, color="0.8", lw=0.8)  # gap / omega marker
axs[1].set_xlabel("harmonic n")
axs[1].set_title("strong field: HHG plateau\n(marker: gap/omega)")
print("strong field: plateau spans ~%d harmonics"
      % int(np.sum(amps_s[1:] > 1e-6 * amps_s[1])))

# ---- SHG dispersion ----------------------------------------------------
ws = np.linspace(0.3, 0.95, 10)
# the whole dispersion sweep is ONE vmapped device program
r = optical.harmonic_spectrum(bn, ws, 1e-3, occ=[0], nk=(36, 36),
                              cycles=24, ramp_cycles=8,
                              steps_per_cycle=72)
shg = r["sigma2"][:, 1]
axs[2].plot(ws, shg.real, "k-", label=r"Re $\sigma^{yxx}$")
axs[2].plot(ws, shg.imag, "-", color="0.6", label=r"Im $\sigma^{yxx}$")
axs[2].axvline(1.0, color="0.85", lw=0.8)  # 2w = gap
axs[2].set_xlabel(r"$\omega$")
axs[2].set_title("SHG dispersion (2-photon edge at gap/2)")
axs[2].legend(frameon=False, fontsize=8)
fig.tight_layout()
fig.savefig("high_harmonics.png", dpi=150)
print("saved high_harmonics.png")

print("Done.")
