#!/usr/bin/env python
"""Shift current: the bulk photovoltaic effect from tight-binding.

Noncentrosymmetric insulators rectify light -- a DC photocurrent
J_a = 2 sigma^{abc}(0; w, -w) E_b E_c flows under uniform illumination
with no junction at all.  pythtb_tpu.optical.shift_current evaluates
the Sipe-Shkrebtii second-order response with the exact sum-rule
generalized derivative (H, dH/dk, d2H/dk2 band matrix elements only --
gauge invariant by construction, no Berry-connection derivative).
The reference framework has no dynamical response of any order.

Panels:
1. Rice-Mele chain: sigma^{xxx}(w) for opposite polarities (the
   current reverses with the polarization -- the hallmark of the
   shift mechanism) against the joint DOS absorption profile;
2. gapped BN monolayer: the C3-constrained 2-D tensor
   (sigma^{yyy} = -sigma^{yxx} = -sigma^{xxy}) across the absorption
   edge.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import models, optical, tb_model


def rice_mele(delta):
    m = tb_model(1, 1, lat=[[1.0]], orb=[[0.0], [0.5]])
    m.set_onsite([delta, -delta])
    m.set_hop(1.3, 0, 1, [0])
    m.set_hop(0.7, 1, 0, [1])
    return m


fig, axs = plt.subplots(1, 2, figsize=(9.5, 3.6))

w = np.linspace(0.5, 4.0, 121)
for delta, style in ((0.4, "-"), (-0.4, "--")):
    sig = optical.shift_current(rice_mele(delta), w, occ=[0], nk=(401,),
                                sigma=0.06)
    axs[0].plot(w, sig[0, 0, 0], style,
                label=r"$\Delta = %+0.1f$" % delta)
jd = optical.joint_dos(rice_mele(0.4), w, occ=[0], nk=(401,), sigma=0.06)
axs[0].plot(w, jd * 0.02, "k:", lw=0.8, label="JDOS (scaled)")
axs[0].set_xlabel(r"$\omega$")
axs[0].set_ylabel(r"$\sigma^{xxx}(\omega)$  [$e^3/\hbar$]")
axs[0].legend()
axs[0].set_title("Rice-Mele: polarity reverses the current")

w2 = np.linspace(1.5, 5.0, 81)
bn = models.bn()
sig2 = optical.shift_current(bn, w2, occ=[0], nk=(121, 121), sigma=0.1)
axs[1].plot(w2, sig2[1, 1, 1], label=r"$\sigma^{yyy}$")
axs[1].plot(w2, sig2[1, 0, 0], label=r"$\sigma^{yxx}$")
axs[1].plot(w2, sig2[0, 0, 1], label=r"$\sigma^{xxy}$")
axs[1].set_xlabel(r"$\omega$")
axs[1].set_title(r"BN: $C_3$ ties the tensor components")
axs[1].legend()

fig.tight_layout()
fig.savefig("shift_current.png", dpi=150)
print("saved shift_current.png")
print("C3 check: yyy = %+.5f, -yxx = %+.5f, -xxy = %+.5f (at w=2.6)"
      % (sig2[1, 1, 1, 22], -sig2[1, 0, 0, 22], -sig2[0, 0, 1, 22]))
print("Done.")
