"""Wavefunction grids and Berry-phase quantities: pythtb_tpu.wf_array.

API-compatible with PythTB 1.8.0's ``wf_array``
(/root/reference/pythtb.py:2283-3205): a (n1..nd, nsta, norb[, spin])
complex array of states over a 1-4 dimensional k/parameter grid, with
periodic-gauge boundary fixups, Berry phases / Wilson loops, Berry
fluxes, and position-operator wrappers.

TPU-native design: storage is **device-resident with a lazy host
view**.  ``solve_on_grid`` builds the k-grid on device (iota), solves
the whole mesh in one compiled call, and appends the periodic-gauge
boundary slices in-program -- the wavefunctions never leave the device
unless the user indexes them.  Berry quantities consume the device copy
directly (band selection and axis arrangement happen inside the jitted
kernels), so a solve -> berry_flux pipeline transfers only scalars.
Host-side mutation (``wf[i, j] = evec``, ``impose_pbc``) transparently
materializes the NumPy view and invalidates the device copy, preserving
exact reference semantics (including mutation through views returned by
``wf[key]``).

Phase-continuity branch fixing stays on host and replicates the
reference's greedy algorithms decision-for-decision
(utils/continuity.py).
"""

from __future__ import annotations

import copy as _copy

import jax
import numpy as np

from .model import PythtbError, _is_int, _offdiag_approximation_warning_and_stop
from .ops import berry as _berry
from .ops import solver as _solver
from .utils import continuity as _cont
from .utils.xfer import host_pack, host_unpack

__all__ = ["wf_array"]


class wf_array(object):
    r"""Array of wavefunctions over a regular 1-4 dimensional grid.

    :param model: associated :class:`pythtb_tpu.tb_model`
    :param mesh_arr: list of mesh dimensions (each >= 2)
    :param nsta_arr: optional number of states stored per grid point
      (defaults to all norb*nspin states)
    """

    def __init__(self, model, mesh_arr, nsta_arr=None):
        if nsta_arr is None:
            self._nsta_arr = model._nsta
        else:
            if not _is_int(nsta_arr):
                raise PythtbError("Argument nsta_arr not an integer")
            self._nsta_arr = nsta_arr
        self._nspin = model._nspin
        self._norb = model._norb
        self._orb = np.copy(model._orb)
        self._model = _copy.deepcopy(model)
        self._mesh_arr = np.array(mesh_arr)
        self._dim_arr = len(self._mesh_arr)
        if True in (self._mesh_arr <= 1).tolist():
            raise PythtbError(
                "Dimension of wf_array object in each direction must be 2 or larger."
            )
        wfs_dim = list(self._mesh_arr) + [self._nsta_arr, self._norb]
        if self._nspin == 2:
            wfs_dim += [self._nspin]
        # host storage: _wfs[k1_index, ..., state, orb(, spin)]
        self._host = np.zeros(tuple(wfs_dim), dtype=complex)
        self._host_valid = True
        # device storage: ri-packed twin of _host
        self._dev = None
        self._dev_valid = False
        # once a live NumPy view of _host has been handed out (wf[key] /
        # the _wfs property), external code can mutate storage at any
        # later time without notice, so device uploads must never be
        # cached again for this object
        self._views_exposed = False
        # optional band energies alongside the states (upstream wish
        # list, /root/reference/notes/TODO:50-54): device-resident when
        # produced by solve_on_grid, host-materialized on access
        self._energies_dev = None
        self._energies_host = None
        # per-band-pair minimum direct gaps from solve_on_grid (nsta-1
        # floats, already on host) -- the transfer-free fast path for
        # band_separation; invalid after choose_states re-subsetting
        self._min_gaps = None

    # -- storage management ---------------------------------------------

    def _sync_host(self):
        if not self._host_valid:
            fresh = host_unpack(np.asarray(self._dev))
            if self._host is not None and self._host.shape == fresh.shape:
                # copy IN PLACE so NumPy views handed out earlier stay
                # aliased to the storage (reference semantics)
                np.copyto(self._host, fresh)
            else:
                self._host = fresh
            self._host_valid = True

    def _host_rw(self, exposes_view=False):
        """Host array for mutation; device copy becomes stale (and is
        released -- it can be a GB-scale grid).  The solve-derived
        ``_min_gaps`` cache is dropped too: once states may have been
        rewritten it can describe an earlier solve (band_separation then
        falls back to the stored energies, which remain whatever the
        last solve / manual assignment produced)."""
        self._sync_host()
        self._dev = None
        self._dev_valid = False
        self._min_gaps = None
        if exposes_view:
            self._views_exposed = True
        return self._host

    def _host_ro(self):
        """Host array for read-only use; device copy stays valid."""
        self._sync_host()
        return self._host

    def _packed(self):
        """Device-resident ri-packed storage (uploads host if stale).

        The upload is cached only while no external views of the host
        array exist; afterwards every device op re-uploads, so writes
        through old views are always honored."""
        if self._dev_valid:
            return self._dev
        dev = jax.device_put(host_pack(self._host_ro()))
        if not self._views_exposed:
            self._dev = dev
            self._dev_valid = True
        return dev

    def _set_device(self, wfs_packed):
        self._dev = wfs_packed
        self._dev_valid = True
        self._host_valid = False
        if self._views_exposed:
            # live views must observe the new data immediately (the
            # reference writes into the same buffer), and can mutate it
            # at any time afterwards -- so materialize in place now and
            # release this device copy
            self._sync_host()
            self._dev = None
            self._dev_valid = False

    @property
    def _wfs(self):
        """Reference-compatible mutable host view of the stored states."""
        return self._host_rw(exposes_view=True)

    @_wfs.setter
    def _wfs(self, value):
        self._host = np.asarray(value, dtype=complex)
        self._host_valid = True
        self._dev_valid = False

    # -- population -----------------------------------------------------

    def solve_on_grid(self, start_k):
        """Solve the model on a uniform grid covering the BZ (inclusive of
        both endpoints, with the last point fixed by the periodic gauge),
        entirely on device.  Returns the minimum direct gap per band pair
        (reference pythtb.py:2421-2532)."""
        if self._dim_arr != self._model._dim_k:
            raise PythtbError(
                "If using solve_on_grid method, dimension of wf_array must equal "
                "dim_k of the tight-binding model!"
            )
        if self._nsta_arr != self._model._nsta:
            raise PythtbError(
                "solve_on_grid requires nsta_arr to match the model's total number "
                "of states (do not pass nsta_arr when initializing this object)."
            )
        if self._dim_arr > 4:
            raise PythtbError("Wrong dimensionality!")
        self._start_k = start_k

        from .parallel import mesh as _pmesh

        static, data = self._model._get_finalized()
        # under an active device mesh the SAME in-program pipeline runs
        # sharded: the iota-built k-batch and the stored state grid carry
        # GSPMD sharding annotations, gauge fixups and the gap reduction
        # stay on device, and only scalars cross the host boundary
        min_gaps, evals_dev, wfs_packed = _solver.solve_grid_device(
            static,
            data,
            [int(m) for m in self._mesh_arr],
            start_k,
            self._orb,
            self._model._per,
            self._nspin,
            mesh=_pmesh.current_mesh(),
        )
        self._set_device(wfs_packed)
        self._energies_dev = evals_dev
        self._energies_host = None
        self._min_gaps = np.array(min_gaps) if self._nsta_arr > 1 else None
        if self._nsta_arr <= 1:
            return None
        return min_gaps

    def solve_on_grid_models(self, models, param_dir=0, start_k=None):
        """Fill a (parameter x k-grid) wf_array from a family of models,
        one per index along ``param_dir`` -- pump cycles, adiabatic
        interpolations, any lambda x BZ workflow.  The upstream wish
        list sketches exactly this split of solve_on_grid into k-grid
        filling per parameter value (/root/reference/notes/TODO:25-37);
        the reference's examples hand-loop ``solve_on_one_point`` over
        every (lambda, k) pair instead (e.g. examples/3site_cycle.py).

        When all models share one hopping graph (same shapes: the
        common case, a parameter sweep over amplitudes/on-site terms),
        the WHOLE family solves as ONE vmapped device program; otherwise
        it falls back to one batched grid solve per model.  The k-axes
        get the same periodic gauge as :meth:`solve_on_grid`; close the
        parameter axis yourself (``impose_loop(param_dir)`` /
        ``impose_pbc``) if lambda is cyclic.  Band energies are stored
        (see :attr:`energies`).

        :param models: sequence of finalizable models,
          ``len(models) == mesh_arr[param_dir]``, each with
          ``dim_k == dim_arr - 1``
        :param param_dir: which grid axis is the parameter axis
        :param start_k: origin of the k-grid (default zeros)
        :returns: minimum direct gap per band pair over the whole family
          (as in :meth:`solve_on_grid`), or None for 1 stored state
        """
        models = list(models)
        if param_dir < 0 or param_dir >= self._dim_arr:
            raise PythtbError("Wrong value of param_dir.")
        if len(models) != int(self._mesh_arr[param_dir]):
            raise PythtbError(
                "Expected %d models along axis %d, got %d"
                % (int(self._mesh_arr[param_dir]), param_dir, len(models))
            )
        k_sizes = [int(m) for d, m in enumerate(self._mesh_arr) if d != param_dir]
        fins = [m._get_finalized() for m in models]
        static0 = fins[0][0]
        for m in models:
            if m._dim_k != self._dim_arr - 1:
                raise PythtbError(
                    "Each family model must have dim_k == dim_arr - 1 "
                    "(the non-parameter axes are the k-grid)."
                )
            if m._nsta != self._nsta_arr:
                raise PythtbError(
                    "solve_on_grid_models requires nsta_arr to match the models."
                )
        if start_k is None:
            start_k = [0.0] * (self._dim_arr - 1)

        # the one-program path additionally requires identical orbital
        # positions and periodic axes: the k-boundary periodic-gauge
        # phases exp(-2*pi*i*orb) are shared across the family
        same_shape = all(s == static0 for s, _ in fins) and all(
            np.array_equal(m._orb, models[0]._orb) and m._per == models[0]._per
            for m in models
        )
        if same_shape:
            import jax.numpy as jnp

            # stack on host: one h2d upload per leaf at the jit boundary
            datas = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[d for _, d in fins]
            )
            min_gaps, evals, wfs = _solver.solve_grid_family(
                static0, datas, k_sizes, start_k,
                models[0]._orb, models[0]._per, self._nspin,
            )
            wfs = jnp.moveaxis(wfs, 0, param_dir)
            evals = jnp.moveaxis(evals, 0, param_dir)
            self._set_device(wfs)
            self._energies_dev = evals
            self._energies_host = None
        else:
            # heterogeneous graphs: one batched device solve per model
            host = self._host_rw()
            E = np.empty(tuple(self._mesh_arr) + (self._nsta_arr,))
            gap_rows = []
            for i, ((s, d), m) in enumerate(zip(fins, models)):
                g, ev, w = _solver.solve_grid_device(
                    s, d, k_sizes, start_k, m._orb, m._per, self._nspin
                )
                ev, w = jax.device_get((ev, w))  # one round trip for both
                sel = (slice(None),) * param_dir + (i,)
                host[sel] = host_unpack(np.asarray(w))
                E[sel] = np.asarray(ev, dtype=np.float64)
                gap_rows.append(g)
            min_gaps = np.min(np.stack(gap_rows), axis=0)
            self._energies_dev = None
            self._energies_host = E
        self._min_gaps = np.array(min_gaps) if self._nsta_arr > 1 else None
        if self._nsta_arr <= 1:
            return None
        return min_gaps

    def solve_on_one_point(self, kpt, mesh_indices):
        """Solve at one k-point and store at mesh_indices
        (reference pythtb.py:2534-2566)."""
        _, evec = self._model.solve_one(kpt, eig_vectors=True)
        host = self._host_rw()
        if _is_int(mesh_indices):
            host[(mesh_indices,)] = evec
        else:
            host[tuple(mesh_indices)] = evec

    # -- array utilities ------------------------------------------------

    def _copy_shell(self):
        """Deep copy without duplicating device buffers."""
        self._sync_host()
        dev, dev_valid = self._dev, self._dev_valid
        edev = self._energies_dev
        self._dev, self._dev_valid = None, False
        self._energies_dev = None
        new = _copy.deepcopy(self)
        self._dev, self._dev_valid = dev, dev_valid
        self._energies_dev = edev
        # the copy sees the same (immutable) device energies
        new._energies_dev = edev
        # the copy owns a fresh host buffer no external view points at
        new._views_exposed = False
        return new

    def choose_states(self, subset):
        """New wf_array keeping only the given state indices
        (reference pythtb.py:2568-2607).  Stored energies (if any) are
        sliced to the subset."""
        subset = np.array(subset, dtype=int)
        if subset.ndim != 1:
            raise PythtbError("Parameter subset must be a one-dimensional array.")
        has_energies = (
            self._energies_host is not None or self._energies_dev is not None
        )
        energies = np.array(self.energies[..., subset]) if has_energies else None
        wf_new = self._copy_shell()
        wf_new._nsta_arr = subset.shape[0]
        idx = (slice(None),) * self._dim_arr + (subset,)
        wf_new._wfs = wf_new._host[idx]
        wf_new._energies_dev = None
        wf_new._energies_host = energies
        wf_new._min_gaps = None  # adjacency broken by re-subsetting
        return wf_new

    def empty_like(self, nsta_arr=None):
        """New uninitialized wf_array of the same shape (optionally with a
        different number of states; reference pythtb.py:2609-2642)."""
        wf_new = self._copy_shell()
        wf_new._energies_dev = None
        wf_new._energies_host = None
        wf_new._min_gaps = None
        if nsta_arr is not None:
            wf_new._nsta_arr = nsta_arr
            shape = list(wf_new._host.shape)
            shape[self._dim_arr] = nsta_arr
            wf_new._wfs = np.empty(tuple(shape), dtype=complex)
        else:
            wf_new._wfs = np.empty_like(wf_new._host)
        return wf_new

    def __check_key(self, key):
        if self._dim_arr == 1:
            if not _is_int(key):
                raise TypeError("Key should be an integer!")
            if key < (-1) * self._mesh_arr[0] or key >= self._mesh_arr[0]:
                raise IndexError("Key outside the range!")
        else:
            if len(key) != self._dim_arr:
                raise TypeError("Wrong dimensionality of key!")
            for i, k in enumerate(key):
                if not _is_int(k):
                    raise TypeError("Key should be set of integers!")
                if k < (-1) * self._mesh_arr[i] or k >= self._mesh_arr[i]:
                    raise IndexError("Key outside the range!")

    def __getitem__(self, key):
        self.__check_key(key)
        # the returned object is a mutable NumPy view (reference
        # semantics) that can outlive this call, so device uploads are
        # never cached again for this object
        return self._host_rw(exposes_view=True)[key]

    def __setitem__(self, key, value):
        self.__check_key(key)
        self._host_rw()[key] = np.array(value, dtype=complex)

    # -- boundary conditions --------------------------------------------

    def impose_pbc(self, mesh_dir, k_dir):
        r"""Periodic gauge across the BZ: set the last grid point along
        ``mesh_dir`` to ``exp(-2j*pi*orb[:, k_dir])`` times the first
        (reference pythtb.py:2674-2749)."""
        if k_dir not in self._model._per:
            raise PythtbError(
                "Periodic boundary condition can be specified only along periodic directions!"
            )
        if mesh_dir < 0 or mesh_dir >= self._dim_arr:
            raise PythtbError("Wrong value of mesh_dir.")
        ffac = np.exp(-2.0j * np.pi * self._orb[:, k_dir])
        if self._nspin == 1:
            phase = ffac
        else:
            phase = np.zeros((self._norb, 2), dtype=complex)
            phase[:, 0] = ffac
            phase[:, 1] = ffac
        host = self._host_rw()
        first = (slice(None),) * mesh_dir + (0, Ellipsis)
        last = (slice(None),) * mesh_dir + (-1, Ellipsis)
        host[last] = host[first] * phase

    def impose_loop(self, mesh_dir):
        """Copy the first slice along mesh_dir onto the last (closed
        non-winding loops; reference pythtb.py:2751-2791)."""
        if mesh_dir < 0 or mesh_dir >= self._dim_arr:
            raise PythtbError("Wrong value of mesh_dir.")
        host = self._host_rw()
        first = (slice(None),) * mesh_dir + (0, Ellipsis)
        last = (slice(None),) * mesh_dir + (-1, Ellipsis)
        host[last] = host[first]

    @property
    def energies(self):
        """Band energies stored alongside the states (an upstream
        wish-list feature, /root/reference/notes/TODO:50-54: "Something
        like wf.energies[i,j]=eval on top of wf[i,j]=evec").

        A mutable float array of shape ``(*mesh, nsta_arr)``:
        :meth:`solve_on_grid` fills it automatically (kept on device
        until first read); manual workflows can assign slices
        (``wf.energies[i, j] = evals``) -- unset entries are NaN.  Used
        by :meth:`band_separation` and the automatic band-separation
        warnings in the Berry methods.

        Energies are *not* invalidated by state writes (``wf[key] =
        ...``): they always describe the last solve or manual
        assignment.  Manual workflows that refill states should refill
        the matching energies too (or leave them NaN, which disables
        the separation warnings).
        """
        if self._energies_host is None:
            if self._energies_dev is not None:
                self._energies_host = np.asarray(
                    jax.device_get(self._energies_dev), dtype=np.float64
                )
                self._energies_dev = None
            else:
                self._energies_host = np.full(
                    tuple(self._mesh_arr) + (self._nsta_arr,), np.nan
                )
        return self._energies_host

    @energies.setter
    def energies(self, value):
        value = np.asarray(value, dtype=np.float64)
        expect = tuple(self._mesh_arr) + (self._nsta_arr,)
        if value.shape != expect:
            raise PythtbError(
                "energies must have shape %s (mesh + nsta_arr), got %s"
                % (expect, value.shape)
            )
        self._energies_host = value
        self._energies_dev = None

    def band_separation(self, occ="All"):
        """Smallest energy separation, over the whole grid, between the
        states ``occ`` and their complement (an upstream wish-list
        feature, /root/reference/notes/TODO:50-54: "Automatic check ...
        that bands are well separated from other bands when computing
        berry phases etc").

        Requires :attr:`energies` (filled by :meth:`solve_on_grid` or
        assigned manually).  Returns ``inf`` when ``occ`` is all stored
        states.  A separation of ~0 means the Berry quantities of
        ``occ`` are mathematically ill-defined on this grid.
        """
        occ = self._occ_index(occ)
        comp = np.setdiff1d(np.arange(self._nsta_arr), occ)
        if comp.size == 0 or occ.size == 0:
            return np.inf
        if self._min_gaps is not None:
            # sorted eigenvalues: the minimum |E_comp - E_occ| is attained
            # at an adjacent pair straddling an occ/comp boundary, and
            # solve_on_grid already reduced those gaps on device
            mask = np.zeros(self._nsta_arr, dtype=bool)
            mask[occ] = True
            boundary = np.nonzero(mask[:-1] != mask[1:])[0]
            return float(self._min_gaps[boundary].min())
        E = self.energies
        if np.isnan(E).any():
            raise PythtbError(
                "band_separation requires energies on the whole grid; run "
                "solve_on_grid or fill wf.energies manually first."
            )
        diff = np.abs(E[..., comp][..., None, :] - E[..., occ][..., :, None])
        return float(diff.min())

    def _check_separation(self, occ, kind):
        """Automatic degeneracy guard for the Berry methods: if energies
        (or the solve_on_grid gap summary) are available and the chosen
        set touches its complement somewhere on the grid, the result is
        gauge noise -- warn.  Transfer-free when _min_gaps exists."""
        if (
            self._min_gaps is None
            and self._energies_host is None
            and self._energies_dev is None
        ):
            return
        E = self._energies_host
        if self._min_gaps is None and E is not None and np.isnan(E).any():
            return  # manually managed, incomplete -- not our call
        sep = self.band_separation(occ)
        if sep < 1e-8:
            import warnings

            warnings.warn(
                "wf_array.%s: the chosen states are degenerate with their "
                "complement somewhere on the grid (min separation %.2e) -- "
                "the result is gauge-dependent noise there. Choose a set "
                "closed under degeneracy." % (kind, sep),
                UserWarning,
                stacklevel=3,
            )

    def save(self, path):
        """Checkpoint this wf_array (model + states + stored energies)
        to a compressed .npz -- resume expensive grid solves with
        :meth:`load` and continue the Berry/Wannier analysis without
        re-diagonalizing.  No pickle.  **[tpu]**"""
        from .utils.serialization import save_wf_array

        save_wf_array(self, path)

    @staticmethod
    def load(path):
        """Load a wf_array written by :meth:`save`.  **[tpu]**"""
        from .utils.serialization import load_wf_array

        return load_wf_array(path)

    def smooth_gauge(self, occ="All", dir=0, closed=True):
        r"""Impose the optimally-smooth parallel-transport gauge of
        Marzari & Vanderbilt 1997 on states ``occ`` along grid axis
        ``dir``, in place (an upstream wish-list feature,
        /root/reference/notes/TODO:17-20, absent from the reference).

        With ``closed=False`` this is pure parallel transport: each
        link overlap of the smoothed states is Hermitian positive
        (zero Berry connection between steps).  With ``closed=True``
        (default) the loop holonomy is distributed evenly along the
        axis via fractional powers, so the gauge is additionally
        consistent with however the axis closes -- both
        :meth:`impose_loop` (last point = first) and :meth:`impose_pbc`
        (last point = phased first) endpoints are preserved exactly.
        The subspace spanned at each grid point is unchanged; only the
        basis within it rotates, so all gauge-invariant quantities
        (Berry phases/fluxes, Wilson eigenphases) are untouched.

        Runs as one log-depth device program: the parallel-transport
        rotation at point m is the cumulative product of the polar-
        unitarized link overlaps (an associative scan), not a
        sequential sweep.  See :mod:`pythtb_tpu.ops.transport`.

        :param occ: stored-state indices to smooth (default all)
        :param dir: grid axis along which to smooth
        :param closed: distribute the loop holonomy (see above)
        """
        from .ops import transport

        occ = self._occ_index(occ)
        if dir < 0 or dir >= self._dim_arr:
            raise PythtbError("Wrong value of dir.")
        packed, min_s = transport.smooth_gauge(
            self._packed(), occ, dir, self._nspin, self._dim_arr, closed
        )
        self._warn_singular(min_s, "smooth_gauge:singular value")
        self._set_device(packed)

    def adiabatic_evolve(self, occ, dir=0, return_states=False):
        r"""Adiabatically follow the subspace spanned by stored states
        ``occ`` along grid axis ``dir`` (an upstream wish-list feature,
        /root/reference/notes/TODO:46-48: "if you start from some set of
        occupied states and then crank up parameter lambda, which
        states do you end up with?").

        Starting from states ``occ`` at index 0 of axis ``dir``, at
        each subsequent grid point the ``len(occ)`` stored states with
        the largest squared overlap against the transported subspace
        are selected and the subspace is parallel-transported into
        them.  This follows states *through* crossings (by continuity
        of the wavefunction) rather than by energy ordering.

        :param occ: stored-state indices of the initial subspace
        :param dir: grid axis to evolve along (a parameter axis such as
          a pump cycle, or any k-axis)
        :param return_states: also return the followed states
        :returns: ``(indices, fidelity)`` -- indices has the evolved
          axis first, shape (L, ..., nocc): which stored states are
          occupied at each step; fidelity (L-1, ...) is the fraction of
          the subspace captured at each step (1 = perfectly adiabatic;
          noticeably below 1 = diabatic leakage through a small gap --
          refine the grid or accept the Landau-Zener crossing).  With
          ``return_states=True`` a third element: a new
          :class:`wf_array` with ``nsta_arr = len(occ)`` holding the
          followed states in a smooth gauge.
        """
        from .ops import transport

        occ = self._occ_index(occ)
        if dir < 0 or dir >= self._dim_arr:
            raise PythtbError("Wrong value of dir.")
        idx, fid, states = transport.follow_states(
            self._packed(), occ, dir, self._nspin, self._dim_arr
        )
        if not return_states:
            return idx, fid
        wf_new = self.empty_like(nsta_arr=len(occ))
        wf_new._set_device(states)
        return idx, fid, wf_new

    # -- internal helpers -----------------------------------------------

    def _occ_index(self, occ):
        if (isinstance(occ, str) and occ == "All") or occ is None:
            return np.arange(self._nsta_arr, dtype=int)
        occ = np.array(occ, dtype=int)
        if occ.ndim != 1:
            raise PythtbError(
                'Parameter occ must be a one-dimensional array or string "All".'
            )
        # validate here: jit-traced gathers CLAMP out-of-range indices,
        # which would silently turn a band-index typo into a wrong
        # topological invariant (the reference raises IndexError)
        if occ.size and (occ.min() < -self._nsta_arr or occ.max() >= self._nsta_arr):
            raise IndexError(
                "occ indices %s out of range for %d states"
                % (np.unique(occ).tolist(), self._nsta_arr)
            )
        return occ % self._nsta_arr if occ.size and occ.min() < 0 else occ

    def _check_w90(self):
        if self._model._assume_position_operator_diagonal is False:
            _offdiag_approximation_warning_and_stop()

    # -- position wrappers ----------------------------------------------

    def _key_occ_states(self, key, occ):
        occ = self._occ_index(occ)
        if _is_int(key):
            key = (key,)
        return self._host_ro()[tuple(key)][occ]

    def position_matrix(self, key, occ, dir):
        """Position matrix at one grid point for the given states
        (reference pythtb.py:2793-2813)."""
        self._check_w90()
        return self._model.position_matrix(self._key_occ_states(key, occ), dir)

    def position_expectation(self, key, occ, dir):
        """Position expectations at one grid point (pythtb.py:2815-2835)."""
        self._check_w90()
        return self._model.position_expectation(self._key_occ_states(key, occ), dir)

    def position_hwf(self, key, occ, dir, hwf_evec=False, basis="wavefunction"):
        """Hybrid Wannier centers/functions at one grid point
        (pythtb.py:2837-2861).  Note the default basis differs from
        tb_model.position_hwf, as in the reference."""
        self._check_w90()
        return self._model.position_hwf(
            self._key_occ_states(key, occ), dir, hwf_evec, basis
        )

    # -- batched position ops (pythtb_tpu extensions) --------------------

    def position_expectation_all(self, occ, dir):
        """Position expectations of the ``occ`` states at EVERY grid
        point in one batched device call: returns
        ``(mesh..., nocc)`` float.  TPU-native replacement for looping
        :meth:`position_expectation` over the grid (cf.
        examples/haldane_hwf.py)."""
        self._check_w90()
        self._model._check_position_dir(dir)
        occ = self._occ_index(occ)
        from .ops import position as _pos

        return _pos.position_expectation_packed(
            self._packed(), self._model._pos_weights(dir), tuple(occ),
            self._nspin, self._dim_arr,
        )

    def position_hwf_all(self, occ, dir, hwf_evec=False, basis="wavefunction"):
        """Hybrid-Wannier centers (and functions) at EVERY grid point in
        one batched device call.  Returns ``hwfc`` of shape
        ``(mesh..., nocc)`` (plus ``hwf`` of shape
        ``(mesh..., nocc, nocc)`` for basis='wavefunction'/'bloch' or
        ``(mesh..., nocc, norb[, spin])`` for basis='orbital' when
        ``hwf_evec``).  TPU-native replacement for looping
        :meth:`position_hwf` over the grid (cf.
        examples/cubic_slab_hwf.py)."""
        self._check_w90()
        self._model._check_position_dir(dir)
        occ = self._occ_index(occ)
        from .ops import position as _pos

        basis = basis.lower().strip()
        if basis not in ("wavefunction", "bloch", "orbital"):
            raise PythtbError(
                "Basis must be either 'wavefunction', 'bloch', or 'orbital'"
            )
        out = _pos.position_hwf_packed(
            self._packed(), self._model._pos_weights(dir), tuple(occ),
            self._nspin, self._dim_arr, hwf_evec, basis == "orbital",
        )
        if not hwf_evec:
            return out
        hwfc, hwf = out
        if basis == "orbital" and self._nspin == 2:
            hwf = hwf.reshape(hwf.shape[:-1] + (self._norb, 2))
        return hwfc, hwf

    # -- Berry phases ----------------------------------------------------

    def _warn_singular(self, min_val, kind):
        """Warn when a link overlap is (near-)singular: the discretized
        Berry quantity is then mathematically undefined -- neighboring
        occupied subspaces contain mutually orthogonal directions -- and
        the returned numbers are noise.  The NumPy reference returns the
        same noise silently; the magnitudes are free by-products of the
        device computation here, so we can afford the diagnostic."""
        from .config import float_dtype

        eps = float(np.finfo(float_dtype()).eps)
        if min_val < np.sqrt(eps):
            import warnings

            warnings.warn(
                "wf_array.%s: smallest link-overlap %s is %.2e -- the "
                "occupied subspaces of neighboring grid points are "
                "(nearly) orthogonal, so the discretized result is "
                "unreliable. Refine the k-grid or check the band choice."
                % (kind.split(":")[0], kind.split(":")[1], min_val),
                UserWarning,
                stacklevel=3,
            )

    def berry_phase(self, occ="All", dir=None, contin=True, berry_evals=False):
        r"""Berry phase along ``dir`` for each string of grid points
        (reference pythtb.py:2863-3066).  With ``berry_evals`` the phases
        of the Wilson-loop eigenvalues are returned instead of the trace.

        Beyond the reference: warns if any link overlap along the
        strings is (nearly) singular, in which case the discretized
        phase is undefined and the returned values are noise (the
        reference returns the same noise silently).

        Example::

            wf = wf_array(model, [31, 31])
            wf.solve_on_grid([-0.5, -0.5])
            flow = wf.berry_phase([0], dir=1, contin=True)   # (31,)
            centers = wf.berry_phase([0, 1], dir=1, berry_evals=True)
        """
        occ = self._occ_index(occ)
        self._check_w90()
        self._check_separation(occ, "berry_phase")
        if self._dim_arr == 1:
            dir = 0
        if dir is None or dir < 0 or dir >= self._dim_arr:
            raise PythtbError("Wrong direction for Berry phase calculation!")
        if self._dim_arr > 3:
            raise PythtbError("Wrong dimensionality!")

        wp = self._packed()
        if not berry_evals:
            ret, mdet = _berry.berry_phase_traced(
                wp, occ, dir, self._nspin, self._dim_arr
            )
            self._warn_singular(mdet, "berry_phase:|det|")
            if self._dim_arr == 1:
                ret = float(ret)
        else:
            # link overlaps -> SVD unitarization -> chain product ->
            # unitary eigenphases, all in one compiled device program
            # (pythtb.py:3824-3838; no host eigvals round trip)
            ret, msv = _berry.berry_evals(
                wp, occ, dir, self._nspin, self._dim_arr
            )  # (rest..., nocc) ascending per string
            self._warn_singular(msv, "berry_phase:singular value")

        if self._dim_arr > 1 or berry_evals:
            ret = np.array(ret, dtype=float)

        # branch-fixing across strings (host, greedy; reference
        # pythtb.py:3036-3065)
        if contin:
            if not berry_evals:
                if self._dim_arr == 2:
                    ret = _cont.one_phase_cont(ret, ret[0])
                elif self._dim_arr == 3:
                    for i in range(ret.shape[1]):
                        clos = ret[0, 0] if i == 0 else ret[0, i - 1]
                        ret[:, i] = _cont.one_phase_cont(ret[:, i], clos)
                elif self._dim_arr != 1:
                    raise PythtbError("Wrong dimensionality!")
            else:
                if self._dim_arr == 2:
                    ret = _cont.array_phases_cont(ret, ret[0, :])
                elif self._dim_arr == 3:
                    for i in range(ret.shape[1]):
                        clos = ret[0, 0, :] if i == 0 else ret[0, i - 1, :]
                        ret[:, i] = _cont.array_phases_cont(ret[:, i], clos)
                elif self._dim_arr != 1:
                    raise PythtbError("Wrong dimensionality!")
        return ret

    # -- Berry flux ------------------------------------------------------

    def berry_flux(self, occ="All", dirs=None, individual_phases=False):
        r"""Integrated Berry curvature over planes spanned by ``dirs``
        (reference pythtb.py:3068-3205).  For dim > 2, computed for every
        2-D slice over the remaining directions.

        :param occ: state indices (or "All")
        :param dirs: the two grid directions spanning the plane
        :param individual_phases: return the (n0-1, n1-1) plaquette
          phases instead of their sum
        :returns: total flux (Chern number x 2 pi for a full-BZ grid),
          or per-slice sums / per-plaquette arrays for rank > 2

        Example::

            wf = wf_array(model, [31, 31])
            wf.solve_on_grid([-0.5, -0.5])
            chern = wf.berry_flux([0]) / (2 * np.pi)
        """
        occ = self._occ_index(occ)
        self._check_w90()
        self._check_separation(occ, "berry_flux")
        if dirs is None:
            dirs = [0, 1]
        if dirs[0] == dirs[1]:
            raise PythtbError(
                "Need to specify two different directions for Berry flux calculation."
            )
        if (
            dirs[0] >= self._dim_arr
            or dirs[1] >= self._dim_arr
            or dirs[0] < 0
            or dirs[1] < 0
        ):
            raise PythtbError("Direction for Berry flux calculation out of bounds.")
        if self._dim_arr not in (2, 3, 4):
            raise PythtbError("Wrong dimensionality!")

        out, mdet = _berry.berry_flux_planes(
            self._packed(), occ, dirs[0], dirs[1], self._nspin, self._dim_arr,
            individual_phases,
        )
        self._warn_singular(mdet, "berry_flux:|det|")
        if self._dim_arr == 2 and not individual_phases:
            return float(out)
        return out
