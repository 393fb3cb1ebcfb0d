"""Smoke-run every example script headlessly (CPU backend).

The reference ships its examples as both documentation and workload
definitions (/root/reference/examples/, SURVEY.md section 2b); this
checks ours all execute end to end.  Figures land in a tmpdir.
"""

import io
import os
import pathlib
import runpy
from contextlib import redirect_stdout

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parents[1] / "examples"
W90_DIR = str(pathlib.Path(__file__).resolve().parent / "data" / "w90_silicon")

FAST = [
    "simple", "0dim", "trestle", "checkerboard", "graphene", "buckled_layer",
    "haldane", "haldane_bp", "cone", "supercell", "visualize", "edge",
    "bn_ribbon_berry", "3site_cycle", "haldane_fin",
]
SLOW = ["kane_mele", "haldane_hwf", "3site_cycle_fin", "cubic_slab_hwf", "chern_tpu", "fkm_z2", "haldane_phase_diagram", "autodiff_tools", "kane_mele_z2_diagram", "structural_family", "hofstadter", "hofstadter_edge", "large_finite", "peierls_ssh", "pump_tools", "wannier_interp", "fermi_arcs", "topology_tools", "axion_fkm", "orbital_magnetization", "realspace_topology", "kpm_hall", "optical_response", "floquet_graphene", "shift_current", "unfold_disorder", "entanglement_flow", "floquet_anomalous", "quantum_geometry", "twisted_bilayer", "realtime_dynamics", "impurity_states", "invariants_toolbox", "high_harmonics", "pseudo_field", "quantum_transport", "mean_field", "hubbard_ed", "rpa_stoner", "magnon_topology", "majorana", "cpa_alloy",
"boltzmann_transport", "phonon_bands", "symmetry_indicators",
"dmft_mott", "eph_linewidths", "excitons_bn", "dmft_arpes",
"many_body_chern", "hall_bar", "neutron_spectra",
"fermi_surface_tools", "quasicrystal", "localization", "weyl_nodes"]
W90 = ["w90", "w90_quick"]


def _run(name, tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.close("all")  # figures accumulate across example runs otherwise
    monkeypatch.chdir(tmp_path)
    script = EXAMPLES_DIR / (name + ".py")
    with redirect_stdout(io.StringIO()) as out:
        runpy.run_path(str(script), run_name="__main__")
    assert "Done." in out.getvalue()


@pytest.mark.parametrize("name", FAST)
def test_example_fast(name, tmp_path, monkeypatch):
    _run(name, tmp_path, monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_example_slow(name, tmp_path, monkeypatch):
    _run(name, tmp_path, monkeypatch)


@pytest.mark.parametrize("name", W90)
def test_example_w90(name, tmp_path, monkeypatch):
    if not os.path.isdir(W90_DIR):
        pytest.skip("silicon Wannier90 data not available")
    monkeypatch.setenv("W90_SILICON", W90_DIR)
    _run(name, tmp_path, monkeypatch)
