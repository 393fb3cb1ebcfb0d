#!/usr/bin/env python
"""Berry phase around the Dirac cone of gapped graphene.

TPU-native port of the reference workload examples/cone.py: a circular
loop around K (manual wf_array fill + impose_loop semantics) and the
Berry flux through a small square patch.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import tb_model, wf_array

lat = [[1.0, 0.0], [0.5, np.sqrt(3.0) / 2.0]]
orb = [[1.0 / 3.0, 1.0 / 3.0], [2.0 / 3.0, 2.0 / 3.0]]
m = tb_model(2, 2, lat, orb)
delta, t = -0.1, -1.0
m.set_onsite([-delta, delta])
m.set_hop(t, 0, 1, [0, 0])
m.set_hop(t, 1, 0, [1, 0])
m.set_hop(t, 1, 0, [0, 1])
m.display()

# circular loop around the K point
circ_step, circ_radius = 31, 0.05
center = np.array([1.0 / 3.0, 2.0 / 3.0])
w_circ = wf_array(m, [circ_step])
for i in range(circ_step):
    ang = 2.0 * np.pi * float(i) / float(circ_step - 1)
    w_circ.solve_on_one_point(center + circ_radius * np.array([np.cos(ang), np.sin(ang)]), i)
w_circ[-1] = w_circ[0]

print("Berry phase around circle of radius", circ_radius)
print("  band 0:    ", w_circ.berry_phase([0], 0))
print("  band 1:    ", w_circ.berry_phase([1], 0))
print("  both bands:", w_circ.berry_phase([0, 1], 0))

# square patch covering the cone
sq_step, sq_len = 31, 0.1
w_sq = wf_array(m, [sq_step, sq_step])
all_kpt = np.zeros((sq_step, sq_step, 2))
for i in range(sq_step):
    for j in range(sq_step):
        kpt = center + sq_len * np.array(
            [-0.5 + float(i) / float(sq_step - 1), -0.5 + float(j) / float(sq_step - 1)]
        )
        all_kpt[i, j] = kpt
        _, evec = m.solve_one(kpt, eig_vectors=True)
        w_sq[i, j] = evec

print("Berry flux on square patch of length", sq_len)
print("  band 0:    ", w_sq.berry_flux([0]))
print("  band 1:    ", w_sq.berry_flux([1]))
print("  both bands:", w_sq.berry_flux([0, 1]))

plaq = w_sq.berry_flux([0], individual_phases=True)
fig, ax = plt.subplots()
ax.imshow(
    plaq.T,
    origin="lower",
    extent=(all_kpt[0, 0, 0], all_kpt[-2, 0, 0], all_kpt[0, 0, 1], all_kpt[0, -2, 1]),
)
ax.set(title="Berry curvature near Dirac cone", xlabel=r"$k_x$", ylabel=r"$k_y$")
fig.tight_layout()
fig.savefig("cone_phases.png")
print("Done.")
