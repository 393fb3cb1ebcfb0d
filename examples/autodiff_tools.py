#!/usr/bin/env python
"""Gradients, band velocities, and spectral functions on device.

Beyond-reference showcase of the differentiable compute path:

1. fit a hopping amplitude to target bands by gradient descent
   (`flows.energy_fn` + `jax.grad`);
2. exact band group velocities dE/dk via autodiff
   (`flows.band_velocities`);
3. Gaussian-broadened total and orbital-projected DOS computed fully on
   device (`flows.density_of_states`, `flows.projected_dos`).
"""
import matplotlib

matplotlib.use("Agg")
import jax
import matplotlib.pyplot as plt
import numpy as np

from pythtb_tpu import flows, models

# --- 1. parameter fitting -------------------------------------------------
target = models.graphene(t=-1.37)
kfit = target.k_uniform_mesh([6, 6])
target_bands = target.solve_all(kfit).T

guess = models.graphene(t=-1.0)
fn, p = flows.energy_fn(guess)
loss = jax.jit(lambda p: ((fn(p, kfit) - target_bands) ** 2).mean())
gradf = jax.jit(jax.grad(loss))
for step in range(150):
    p = {**p, "amps": p["amps"] - 0.5 * gradf(p)["amps"]}
fitted_t = float(np.array(p["amps"])[0, 0])
print("fitted hopping t = %.5f (target -1.37), loss %.2e" % (fitted_t, float(loss(p))))

# --- 2. band velocities ---------------------------------------------------
m = models.haldane(delta=0.2)
k_vec, k_dist, k_node = m.k_path(
    [[0, 0], [2 / 3, 1 / 3], [0.5, 0.5], [0, 0]], 121, report=False
)
vels, evals = flows.band_velocities(m, k_vec)
speed = np.linalg.norm(vels, axis=2)  # |dE/dk| per band/kpt (reduced frame)
print("max group speed (reduced units): %.3f" % speed.max())

fig, axs = plt.subplots(1, 3, figsize=(10.5, 3.2))
for band in range(2):
    axs[0].plot(k_dist, evals[band], "k-", lw=0.8)
    sc = axs[0].scatter(k_dist, evals[band], c=speed[band], s=8, cmap="viridis")
axs[0].set(title="Bands colored by |dE/dk|", xlabel="k-path", ylabel="E")
fig.colorbar(sc, ax=axs[0])

# --- 3. DOS and projected DOS ----------------------------------------------
e, dos = flows.density_of_states(m, (96, 96), sigma=0.06)
_, pdos = flows.projected_dos(m, (96, 96), sigma=0.06)
axs[1].plot(e, dos, "k-")
axs[1].set(title="DOS (device, Gaussian broadened)", xlabel="E", ylabel="states/cell")
axs[2].plot(e, pdos[:, 0], label="orbital A")
axs[2].plot(e, pdos[:, 1], label="orbital B")
axs[2].set(title="Orbital-projected DOS", xlabel="E")
axs[2].legend()
fig.tight_layout()
fig.savefig("autodiff_tools.png")
print("Done.")
