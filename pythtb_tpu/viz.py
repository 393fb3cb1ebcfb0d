"""Text report and matplotlib geometry visualization.

Host-side, equivalents of ``tb_model.display``
(/root/reference/pythtb.py:562-634) and ``tb_model.visualize``
(pythtb.py:636-860): text dump of the model, and a 2-D projection of
orbitals / hoppings / an optional eigenstate with amplitude-sized,
phase-colored markers ("black", "red-blue", or "wheel" color schemes).
matplotlib is imported lazily, as in the reference (pythtb.py:733).
"""

from __future__ import annotations

import numpy as np

__all__ = ["display", "visualize"]


def _nice_float(x, just, rnd):
    return str(round(x, rnd)).rjust(just)


def _nice_int(x, just):
    return str(x).rjust(just)


def _nice_complex(x, just, rnd):
    ret = _nice_float(complex(x).real, just, rnd)
    ret += " - " if complex(x).imag < 0.0 else " + "
    ret += _nice_float(abs(complex(x).imag), just, rnd) + " i"
    return ret


def display(model):
    """Print a human-readable report of the model."""
    print("---------------------------------------")
    print("report of tight-binding model")
    print("---------------------------------------")
    print("k-space dimension           =", model._dim_k)
    print("r-space dimension           =", model._dim_r)
    print("number of spin components   =", model._nspin)
    print("periodic directions         =", model._per)
    print("number of orbitals          =", model._norb)
    print("number of electronic states =", model._nsta)
    print("lattice vectors:")
    for i, o in enumerate(model._lat):
        row = " , ".join(_nice_float(v, 7, 4) for v in o)
        print(" #", _nice_int(i, 2), " ===>  [", row, "]")
    print("positions of orbitals:")
    for i, o in enumerate(model._orb):
        row = " , ".join(_nice_float(v, 7, 4) for v in o)
        print(" #", _nice_int(i, 2), " ===>  [", row, "]")
    print("site energies:")
    for i, site in enumerate(model._site_energies):
        if model._nspin == 1:
            print(" #", _nice_int(i, 2), " ===>  ", _nice_float(site, 7, 4))
        else:
            print(" #", _nice_int(i, 2), " ===>  ", str(site).replace("\n", " "))
    print("hoppings:")
    for h in model._hoppings:
        tail = ""
        if len(h) == 4:
            tail = " + [ " + " , ".join(_nice_int(v, 2) for v in h[3]) + " ]"
        amp_str = (
            _nice_complex(h[0], 7, 4)
            if model._nspin == 1
            else str(h[0]).replace("\n", " ")
        )
        print("<", _nice_int(h[1], 2), "| H |", _nice_int(h[2], 2), tail, ">     ===> ", amp_str)
    print("hopping distances:")
    for h in model._hoppings:
        pos_i = np.dot(model._orb[h[1]], model._lat)
        pos_j = np.dot(model._orb[h[2]], model._lat)
        if len(h) == 4:
            pos_j = pos_j + np.dot(h[3], model._lat)
        tail = ""
        if len(h) == 4:
            tail = " + [ " + " , ".join(_nice_int(v, 2) for v in h[3]) + " ]"
        print(
            "|  pos(", _nice_int(h[1], 2), ")  - pos(", _nice_int(h[2], 2), tail,
            ") |  =  ", _nice_float(float(np.linalg.norm(pos_j - pos_i)), 7, 4),
        )
    print()


def visualize(model, dir_first, dir_second=None, eig_dr=None, draw_hoppings=True, ph_color="black"):
    """2-D projected sketch of the model; returns (fig, ax)."""
    if eig_dr is not None:
        if np.asarray(eig_dr).shape != (model._norb,):
            raise ValueError("Wrong format of eig_dr! Must be array of size norb.")
    if ph_color not in ["black", "red-blue", "wheel"]:
        raise ValueError("Wrong value of ph_color parameter!")
    if dir_second is None and model._dim_r > 1:
        raise ValueError("Need to specify index of second coordinate for projection!")

    import matplotlib.pyplot as plt

    fig = plt.figure(
        figsize=[plt.rcParams["figure.figsize"][0], plt.rcParams["figure.figsize"][0]]
    )
    ax = fig.add_subplot(111, aspect="equal")

    def proj(v):
        return [v[dir_first], 0.0 if dir_second is None else v[dir_second]]

    def to_cart(red):
        return np.dot(red, model._lat)

    if eig_dr is None or ph_color == "black":
        c_cell, c_orb, c_nei, c_hop = "b", "r", [0.85, 0.65, 0.65], "g"
    else:
        c_cell, c_orb = [0.4, 0.4, 0.4], [0.0, 0.0, 0.0]
        c_nei, c_hop = [0.6, 0.6, 0.6], [0.0, 0.0, 0.0]

    def color_to_phase(ph):
        if ph_color == "black":
            return "k"
        if ph_color == "red-blue":
            frac = np.abs(ph / np.pi)
            return [1.0 - frac, 0.0, frac]
        # "wheel": hue steps of pi/3 -> red, yellow, green, cyan, blue, magenta
        if ph < 0.0:
            ph += 2.0 * np.pi
        ph = 6.0 * ph / (2.0 * np.pi)
        x_ph = 1.0 - np.abs(ph % 2.0 - 1.0)
        sector = int(min(ph, 5.999) // 1)
        table = [
            [1.0, x_ph, 0.0],
            [x_ph, 1.0, 0.0],
            [0.0, 1.0, x_ph],
            [0.0, x_ph, 1.0],
            [x_ph, 0.0, 1.0],
            [1.0, 0.0, x_ph],
        ]
        return table[sector]

    # origin and periodic cell vectors
    ax.plot([0.0], [0.0], "o", c=c_cell, mec="w", mew=0.0, zorder=7, ms=4.5)
    for i in model._per:
        vec = proj(model._lat[i])
        ax.plot([0.0, vec[0]], [0.0, vec[1]], "-", c=c_cell, lw=1.5, zorder=7)

    # orbitals
    for i in range(model._norb):
        pos = proj(to_cart(model._orb[i]))
        ax.plot([pos[0]], [pos[1]], "o", c=c_orb, mec="w", mew=0.0, zorder=10, ms=4.0)

    # hoppings, drawn in both directions with a slight bend
    if draw_hoppings:
        for h in model._hoppings:
            for s in range(2):
                pos_i = np.copy(model._orb[h[1]]).astype(float)
                pos_j = np.copy(model._orb[h[2]]).astype(float)
                if model._dim_k != 0:
                    if s == 0:
                        pos_j[model._per] = pos_j[model._per] + h[3][model._per]
                    else:
                        pos_i[model._per] = pos_i[model._per] - h[3][model._per]
                pos_i = np.array(proj(to_cart(pos_i)))
                pos_j = np.array(proj(to_cart(pos_j)))
                pos_mid = (pos_i + pos_j) * 0.5
                dif = pos_j - pos_i
                orth = np.array([dif[1], -1.0 * dif[0]])
                nrm = np.sqrt(np.dot(orth, orth))
                if nrm > 0:
                    orth = orth / nrm
                    pos_mid = pos_mid + orth * 0.05 * np.sqrt(np.dot(dif, dif))
                pnts = np.array([pos_i, pos_mid, pos_j]).T
                ax.plot(pnts[0], pnts[1], "-", c=c_hop, lw=0.75, zorder=8)
                ax.plot([pos_i[0]], [pos_i[1]], "o", c=c_nei, zorder=9, mew=0.0, ms=4.0, mec="w")
                ax.plot([pos_j[0]], [pos_j[1]], "o", c=c_nei, zorder=9, mew=0.0, ms=4.0, mec="w")

    # eigenstate markers: size ~ amplitude, color ~ phase
    if eig_dr is not None:
        for i in range(model._norb):
            pos = proj(to_cart(model._orb[i]))
            nrm = float((eig_dr[i] * np.conj(eig_dr[i])).real)
            nrm_rad = 2.0 * nrm * float(model._norb)
            phase = np.angle(eig_dr[i])
            ax.plot(
                [pos[0]], [pos[1]], "o",
                c=color_to_phase(phase), mec="w", mew=0.0, ms=nrm_rad, zorder=11, alpha=0.8,
            )

    # square up the limits
    xl, yl = ax.set_xlim(), ax.set_ylim()
    centx, centy = (xl[1] + xl[0]) * 0.5, (yl[1] + yl[0]) * 0.5
    mx = max([xl[1] - xl[0], yl[1] - yl[0]])
    extr = 0.05
    ax.set_xlim(centx - mx * (0.5 + extr), centx + mx * (0.5 + extr))
    ax.set_ylim(centy - mx * (0.5 + extr), centy + mx * (0.5 + extr))
    return (fig, ax)
