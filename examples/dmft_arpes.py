#!/usr/bin/env python
"""Real-frequency spectra of the interacting lattice: exact ED-DMFT
real axis + Pade cross-check.

The converged ED-DMFT state is a finite pole model, so its real-axis
self-energy is CLOSED FORM (``DMFTResult.sigma_real``) -- no numerical
analytic continuation.  Shown here on the half-filled square-lattice
Hubbard model:

1. the ARPES-style momentum-resolved spectral function A(k, w) along
   Gamma-X-M-Gamma (``dmft.band_spectral``, one device program over
   the (N_k x n_w) grid): quasiparticle band narrowed by Z at small U,
   split into upper/lower Hubbard bands in the Mott phase;
2. the local spectral function A_loc(w) (``local_spectral``) across U
   -- the three-peak metal collapsing into the Mott gap;
3. the within-package differential that usually does not exist:
   Thiele-Pade continuation (``continuation.pade``) of the MATSUBARA
   data against the exact real-axis result it is supposed to recover.
"""
import warnings

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import pythtb_tpu as pt
from pythtb_tpu import continuation, dmft

# half-filled square-lattice Hubbard model (t = 1, bandwidth 8)
sq = pt.tb_model(2, 2, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
sq.set_hop(-1.0, 0, 0, [1, 0])
sq.set_hop(-1.0, 0, 0, [0, 1])

om = np.linspace(-8.0, 8.0, 401)
kpath, kdist, knode = sq.k_path(
    [[0, 0], [0.5, 0], [0.5, 0.5], [0, 0]], 121, report=False)

fig = plt.figure(figsize=(11.5, 7.5))
gs = fig.add_gridspec(2, 3, height_ratios=[1.4, 1.0], hspace=0.35,
                      wspace=0.3)

runs = {}
for iu, U in enumerate((2.0, 10.0)):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runs[U] = dmft.solve(sq, U=U, beta=15.0, nk=24, n_matsubara=192,
                             n_bath=4, max_iter=60, tol=1e-6)
    A = dmft.band_spectral(runs[U], kpath, om, eta=0.15)
    ax = fig.add_subplot(gs[0, iu])
    ax.pcolormesh(kdist, om, A.T, cmap="magma", rasterized=True)
    ax.plot(kdist, -2.0 * (np.cos(2 * np.pi * kpath[:, 0])
                           + np.cos(2 * np.pi * kpath[:, 1]))
            + runs[U].mu - 0.5 * U, c="cyan", lw=0.6, ls="--",
            label="U=0 band")
    ax.set_xticks(knode)
    ax.set_xticklabels([r"$\Gamma$", "X", "M", r"$\Gamma$"])
    ax.set_ylabel(r"$\omega - \mu$")
    ax.set_ylim(-8, 8)
    ax.set_title("A(k,w), U=%g (Z=%.2f)" % (U, runs[U].Z))
    ax.legend(loc="upper right", fontsize=7)

# local spectra across the transition
axl = fig.add_subplot(gs[0, 2])
for U, c in ((2.0, "C0"), (10.0, "C3")):
    Al = runs[U].local_spectral(om, eta=0.15)
    axl.plot(om, Al, c=c, label="U=%g" % U)
axl.set_xlabel(r"$\omega - \mu$")
axl.set_ylabel(r"$A_{\rm loc}(\omega)$")
axl.set_title("local spectral function")
axl.legend()

# Pade vs exact real axis (the differential oracle, U=2 metal)
r = runs[2.0]
axp = fig.add_subplot(gs[1, 0:2])
a_exact = r.spectral(om, eta=0.3)
a_pade = continuation.pade_spectral(r.wn, r.g_imp, om, eta=0.3)
axp.plot(om, a_exact, "k-", lw=1.5, label="exact Lehmann real axis")
axp.plot(om, a_pade, "C1--", lw=1.2, label="Pade from Matsubara data")
axp.set_xlabel(r"$\omega - \mu$")
axp.set_ylabel(r"$A_{\rm imp}(\omega)$")
axp.set_title("analytic continuation vs the exact answer (U=2)")
axp.legend()

# real-axis self-energy in the Mott phase: the in-gap Sigma pole
axs = fig.add_subplot(gs[1, 2])
s = runs[10.0].sigma_real(om, eta=0.3)
axs.plot(om, s.real - 5.0, label=r"Re$\Sigma - U/2$")
axs.plot(om, s.imag, label=r"Im$\Sigma$")
axs.set_xlabel(r"$\omega - \mu$")
axs.set_title("Mott-phase self-energy (U=10)")
axs.legend(fontsize=8)

fig.suptitle("ED-DMFT real-frequency spectra: square-lattice Hubbard")
fig.savefig("dmft_arpes.pdf", bbox_inches="tight")
print("saved dmft_arpes.pdf")
print("Done.")
print("Z(U=2) = %.3f, Z(U=10) = %.3f" % (runs[2.0].Z, runs[10.0].Z))
