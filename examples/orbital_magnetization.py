#!/usr/bin/env python
"""Orbital magnetization of the Haldane model: band sum vs thermodynamics.

Beyond-reference showcase (modern theory of orbital magnetization,
Ceresoli-Thonhauser-Vanderbilt-Resta PRB 74, 024408 (2006)): the bulk
band-sum M(mu) is compared against its thermodynamic definition
-(1/2 pi) dE_total/dphi per cell of a finite Peierls flake, and the
in-gap slope dM/dmu = C/(2 pi) reads off the Chern number.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, magnetic, models

m = models.haldane(delta=0.2, t2=0.15 * np.exp(0.7j))
e = m.solve_all(m.k_uniform_mesh((41, 41)))
gap = (e[0].max(), e[1].min())

mus = np.linspace(gap[0] + 0.02, gap[1] - 0.02, 13)
Ms = np.array([flows.orbital_magnetization(m, [0], nk=(101, 101), mu=mu)
               for mu in mus])
C = flows.chern_number(m, [0], nk=(101, 101))
slope = np.polyfit(mus, Ms, 1)[0]
print("in-gap dM/dmu = %.5f  vs  C/2pi = %.5f" % (slope, C / (2 * np.pi)))

# thermodynamic check at midgap from a 16x16 flake
mu0 = 0.5 * (gap[0] + gap[1])
L = 16
flake = m.cut_piece(L, 0, glue_edgs=False).cut_piece(L, 1, glue_edgs=False)
ev0 = np.sort(np.asarray(flake.solve_all()).ravel())
nocc = int((ev0 < mu0).sum())


def etot(phi):
    fl = magnetic.peierls_model(flake, phi, dirs=(0, 1))
    ev = np.sort(np.asarray(fl.solve_all()).ravel())
    return ev[:nocc].sum()


d = 1e-4
M_thermo = -(etot(d) - etot(-d)) / (2 * d) / (L * L) / (2 * np.pi)
M_band = flows.orbital_magnetization(m, [0], nk=(121, 121), mu=mu0)
print("M(midgap): band sum %.5f  vs  flake -dE/dphi/(2 pi N) %.5f"
      % (M_band, M_thermo))

fig, ax = plt.subplots(figsize=(5.2, 3.4))
ax.plot(mus, Ms, "o-", label="band sum $M(\\mu)$")
ax.plot(mus, Ms[6] + (mus - mus[6]) * C / (2 * np.pi), "k--",
        label=r"slope $C/2\pi$")
ax.plot([mu0], [M_thermo], "s", ms=9, mfc="none",
        label="flake $-\\frac{1}{2\\pi}dE/d\\phi$")
ax.set(xlabel=r"$\mu$", ylabel=r"$M$",
       title="Haldane orbital magnetization")
ax.legend(fontsize=8)
fig.tight_layout()
fig.savefig("orbital_magnetization.png", dpi=150)
print("Done.")
