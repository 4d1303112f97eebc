"""Fully-fused on-device Monte-Carlo pipeline, sharded over a mesh.

One jitted SPMD program per sweep point: per device shard — sample the
storage circuit, build differenced spacetime syndromes, run batched BP,
apply the final-round correction, test the logicals — then ``psum`` the
failure count over the data axis.  This is the TPU-native replacement for
the reference's fork-a-Pool-of-CPU-workers outer loop
(``/root/reference/python/qldpc/misc/p_sweep.py:17-29``): the only
host<->device traffic per point is one PRNG key in and two scalars out.

Shots whose BP did not converge can optionally be returned for host-side
OSD post-processing (the BP+OSD statistical contract — OSD touches only the
few BP failures, SURVEY.md §7).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circuits.ir import ParsedCircuit, parse_circuit
from ..circuits.storage_sim import build_storage_simulation
from ..core import QuantumCode
from ..decoders.bp import dense_ops_device, priors_to_llr, resolve_use_matmul
from ..decoders.spacetime_bp import _stbp_core
from ..decoders.spacetime import SpacetimeCode
from ..decoders.tanner import TannerELL
from ..sampler.device import build_record_sampler
from .mesh import DATA_AXIS

__all__ = ["StorageDecodePipeline"]


@dataclass(eq=False)
class StorageDecodePipeline:
    """End-to-end sample+decode step for a storage experiment.

    Parameters mirror ``run_simulation`` (``misc/_experiment.py:154-210``)
    restricted to the device-resident bposd path (plain BP on the spacetime
    matrix; OSD fallback data is returned to the host).
    """

    code: QuantumCode
    rounds: int
    noise_model: object  # NoiseRewriter
    data_prior: float
    meas_prior: float
    shots_per_device: int
    max_iter: int = 40
    bp_method: str = "ps"
    ms_scaling_factor: float = 0.0
    mesh: Optional[Mesh] = None
    # fixed-iteration flooding by default: identical statistics at relevant
    # iteration budgets, much cheaper XLA compile than the early-stop
    # while_loop (which pays a per-iteration syndrome check)
    early_stop: bool = False
    # "bfloat16" halves message bytes in the bandwidth-bound spacetime check
    # update (~1.4x wall-clock, statistically LER-neutral for min-sum) — the
    # XLA path's knob; the Pallas backend below supersedes it when it fits
    msg_dtype: str = "float32"
    # "auto": use the VMEM-resident Pallas spacetime kernel on real TPU
    # backends when it fits (measured 6.6x over the XLA path on 4-round
    # HGP-225; f32, 100% hard-decision agreement); "xla" forces the XLA
    # core; "pallas" forces the kernel (errors off-TPU)
    bp_backend: str = "auto"
    # > 0: the device step additionally ships (up to cap per device) the
    # syndromes+readouts of BP-unconverged shots to the host, where a full
    # BP+OSD decode replaces their plain-BP correction (the reference bposd
    # statistical contract: OSD touches exactly the BP failures,
    # ``misc/_experiment.py:62-83``).  Use :meth:`run_bposd`.
    osd_fallback_cap: int = 0
    osd_options: Optional[dict] = None
    # X-basis memory experiment: prepare/read |+>, decode the X-check
    # history with checks.x / logicals.x (reference surface
    # ``storage_sim.py:110-118``; its drivers hardcode Z)
    use_x_logicals: bool = False

    def __post_init__(self):
        code = self.code
        sim = build_storage_simulation(
            self.rounds, self.noise_model, code,
            use_x_logicals=self.use_x_logicals)
        self.storage_sim = sim
        self.parsed = parse_circuit(sim.circuit)
        self.x_count = code.checks.x.shape[0]
        self.z_count = code.checks.z.shape[0]
        self.num_data = code.num_qubits
        checks_sector = code.checks.x if self.use_x_logicals else code.checks.z
        self._sector_logicals = (
            code.logicals.x if self.use_x_logicals else code.logicals.z)

        self.spacetime = SpacetimeCode(checks_sector, self.rounds)
        # structured spacetime BP (decoders/spacetime_bp.py): per-round
        # batched routing on the BASE code's Tanner graph — (rounds+1)x fewer
        # FLOPs than generic BP on the stacked spacetime matrix
        self.tanner = TannerELL.from_check_matrix(checks_sector)
        prior = np.zeros(self.spacetime.spacetime_check_matrix.shape[1])
        prior[: self.spacetime._datablock_size] = self.data_prior
        prior[self.spacetime._datablock_size:] = self.meas_prior
        self.prior_llr = priors_to_llr(prior)

        self._Hz = jnp.asarray(checks_sector.toarray(), dtype=jnp.float32)  # (r, n)
        self._Lz = jnp.asarray(self._sector_logicals, dtype=jnp.float32)  # (k, n)

        # dense one-hot BP operands as runtime args (multi-MB HLO constants
        # make remote compiles pathologically slow)
        if resolve_use_matmul(self.tanner, "auto"):
            self._dense_ops = dense_ops_device(self.tanner)
        else:
            self._dense_ops = None

        # runtime-rebindable parameters: noise probabilities + BP priors.
        # One compile serves a whole p sweep (see rebind_noise)
        self._noise_args = jnp.asarray(self.parsed.noise_args())
        self._prior = jnp.asarray(self.prior_llr)

        self._osd = None
        if self.osd_fallback_cap > 0:
            if self.osd_fallback_cap > self.shots_per_device:
                raise ValueError("osd_fallback_cap exceeds shots_per_device")
            self._osd = self._build_osd_corrector()

        self._pallas = self._resolve_backend()
        self._step = self._build()

    def _build_osd_corrector(self):
        from ..decoders.drivers import BPOSDCorrect

        opts = dict(self.osd_options or {})
        opts.setdefault("max_iter", self.max_iter)
        opts.setdefault("bp_method", self.bp_method)
        opts.setdefault("ms_scaling_factor", self.ms_scaling_factor)
        return BPOSDCorrect(self.code, self.rounds, opts,
                            (self.data_prior, self.meas_prior),
                            basis="x" if self.use_x_logicals else "z")

    def _resolve_backend(self) -> bool:
        from ..decoders.spacetime_bp_pallas import fits_stbp_pallas

        if self.bp_backend == "xla":
            return False
        if self.early_stop:  # kernel is fixed-iteration only
            if self.bp_backend == "pallas":
                raise ValueError("bp_backend='pallas' requires early_stop=False")
            return False
        fits = fits_stbp_pallas(self.tanner, self.rounds, 128)
        if self.bp_backend == "pallas":
            if not fits:
                raise ValueError("spacetime program too large for the Pallas kernel")
            return True
        # auto: real TPU only (the Mosaic kernel has no CPU lowering)
        devices = self.mesh.devices.flat if self.mesh is not None else jax.devices()
        on_tpu = all(d.platform == "tpu" for d in devices)
        return fits and on_tpu

    def _device_step(self, key, dense_ops, noise_args, prior_llr):
        """Single-shard step: key -> (failures, shots, bp_unconverged)."""
        S = self.shots_per_device
        sample = build_record_sampler(self.parsed, S, parametric=True)
        record = sample(key, noise_args).astype(jnp.float32)  # (S, M)
        return self._decode_records(record, dense_ops, prior_llr)

    def _decode_records(self, record, dense_ops, prior_llr):
        """Shared decode path: (S, M) record -> (failures, shots, unconv)."""
        S = record.shape[0]
        rounds = self.rounds
        r = self.x_count if self.use_x_logicals else self.z_count
        mpr = self.x_count + self.z_count
        # per-round memory-basis syndromes + final syndrome from transversal
        # readout (record layout per round: [x_checks..., z_checks...])
        blk = 0 if self.use_x_logicals else self.x_count
        readout = record[:, mpr * rounds : mpr * rounds + self.num_data]
        if rounds > 0:
            per_round = record[:, : mpr * rounds].reshape(S, rounds, mpr)
            history = per_round[:, :, blk : blk + r]  # (S, rounds, r)
        else:
            history = jnp.zeros((S, 0, r), dtype=jnp.float32)
        final = jnp.mod(readout @ self._Hz.T, 2.0)  # (S, r)
        synd = jnp.concatenate([history, final[:, None, :]], axis=1)  # (S, rounds+1, r)
        synd = jnp.concatenate(
            [synd[:, :1], jnp.mod(synd[:, 1:] + synd[:, :-1], 2.0)], axis=1
        )
        synd = synd.reshape(S, (rounds + 1) * r).astype(jnp.uint8)

        if self._pallas:
            from ..decoders.spacetime_bp_pallas import stbp_pallas_fixed

            hard, _post, conv, _iters = stbp_pallas_fixed(
                self.tanner, rounds, prior_llr, synd.T,
                self.bp_method, self.max_iter, float(self.ms_scaling_factor),
            )
        else:
            hard, _post, conv, _iters = _stbp_core(
                self.tanner,
                rounds,
                prior_llr,
                synd.T,
                self.bp_method,
                self.max_iter,
                jnp.float32(self.ms_scaling_factor),
                self.early_stop,
                "auto",
                dense_ops,
                self.msg_dtype,
            )
        # final-round correction: mod-2 sum of the per-round data blocks
        n = self.num_data
        data_blocks = hard.T[:, : (rounds + 1) * n].reshape(S, rounds + 1, n)
        correction = jnp.mod(jnp.sum(data_blocks, axis=1), 2).astype(jnp.float32)
        corrected = jnp.mod(readout + correction, 2.0)
        flips = jnp.mod(corrected @ self._Lz.T, 2.0)  # (S, k)
        failed = jnp.any(flips > 0.5, axis=1)
        unconv = jnp.sum((~conv).astype(jnp.int32))
        if self.osd_fallback_cap <= 0:
            return (jnp.sum(failed.astype(jnp.int32)), jnp.int32(S), unconv)
        # count plain-BP failures among CONVERGED shots only; compact the
        # unconverged shots to the front and ship them for host-side OSD
        cap = self.osd_fallback_cap
        f_conv = jnp.sum((failed & conv).astype(jnp.int32))
        order = jnp.argsort(conv.astype(jnp.int32), stable=True)[:cap]
        return (
            f_conv,
            jnp.int32(S),
            unconv,
            synd[order],
            readout[order],
            ~conv[order],
        )

    def _build(self):
        dense = self._dense_ops
        fallback = self.osd_fallback_cap > 0
        if self.mesh is None:
            step = jax.jit(self._device_step)
            if not fallback:
                return lambda key: tuple(
                    int(x) for x in step(key, dense, self._noise_args, self._prior))

            def run_local(key):
                f, s, u, synd, readout, valid = step(
                    key, dense, self._noise_args, self._prior)
                return int(f), int(s), int(u), synd, readout, valid

            return run_local

        mesh = self.mesh

        def sharded(keys, dense_ops, noise_args, prior_llr):
            out = self._device_step(keys[0], dense_ops, noise_args, prior_llr)
            f = jax.lax.psum(out[0], DATA_AXIS)
            s = jax.lax.psum(out[1], DATA_AXIS)
            u = jax.lax.psum(out[2], DATA_AXIS)
            return (f, s, u) + out[3:]

        # check_vma=False: the BP while_loop carry starts from unvarying
        # constants (priors) and becomes data-varying inside the loop, which
        # the varying-manual-axes checker rejects; the computation is still
        # correctly per-shard SPMD.
        out_specs = ((P(), P(), P()) + (P(DATA_AXIS),) * 3) if fallback else P()
        mapped = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P(), P()),
            out_specs=out_specs,
            check_vma=False,
        )
        jitted = jax.jit(mapped)
        n_data = mesh.shape[DATA_AXIS]

        def run(key):
            keys = jax.random.split(key, n_data)
            out = jitted(keys, dense, self._noise_args, self._prior)
            return tuple(int(x) for x in out[:3]) + tuple(out[3:])

        return run

    def run(self, key):
        """key -> (logical_failures, total_shots, bp_unconverged_shots).

        With ``osd_fallback_cap`` set this is :meth:`run_bposd` (failures
        include the host-side OSD decode of the BP-unconverged shots)."""
        if self.osd_fallback_cap > 0:
            return self.run_bposd(key)
        return self._step(key)

    def run_bposd(self, key):
        """BP on device + OSD on the BP failures (host): key ->
        (logical_failures, total_shots, osd_decoded_shots).  Matches the
        reference ``bposd`` mode statistically: every shot's correction is
        BP if BP converged, else BP+OSD on the full spacetime matrix."""
        if self._osd is None:
            raise ValueError("construct the pipeline with osd_fallback_cap > 0")
        f_conv, shots, unconv, synd, readout, valid = self._step(key)
        n_shards = 1 if self.mesh is None else self.mesh.shape[DATA_AXIS]
        if unconv > self.osd_fallback_cap * n_shards:
            raise RuntimeError(
                f"{unconv} BP-unconverged shots exceed osd_fallback_cap="
                f"{self.osd_fallback_cap} per device; raise the cap")
        valid = np.asarray(valid)
        if not valid.any():
            return f_conv, shots, 0
        synd = np.asarray(synd)[valid].astype(np.int64)
        readout = np.asarray(readout)[valid].astype(np.int64)
        corr = self._osd._bpd.decode_batch(synd)
        final = self._osd._spacetime_code.final_correction(np.asarray(corr))
        corrected = (readout + final) % 2
        flips = (corrected @ np.asarray(self._Lz, dtype=np.int64).T) % 2
        f_osd = int(np.any(flips != 0, axis=1).sum())
        return f_conv + f_osd, shots, int(valid.sum())

    def rebind_noise(self, noise_model, data_prior: float, meas_prior: float):
        """Re-bind the pipeline to a new noise model / priors WITHOUT
        recompiling: only probability VALUES may change — the rewritten
        circuit must have the same structure (same channels in the same
        places), which holds across the p grid of a sweep."""
        sim = build_storage_simulation(
            self.rounds, noise_model, self.code,
            use_x_logicals=self.use_x_logicals)
        parsed = parse_circuit(sim.circuit)
        if parsed.structure_signature() != self.parsed.structure_signature():
            raise ValueError(
                "rebind_noise: circuit structure changed; build a new pipeline")
        self._noise_args = jnp.asarray(parsed.noise_args())
        prior = np.zeros(self.spacetime.spacetime_check_matrix.shape[1])
        prior[: self.spacetime._datablock_size] = data_prior
        prior[self.spacetime._datablock_size:] = meas_prior
        self.data_prior, self.meas_prior = data_prior, meas_prior
        self.prior_llr = priors_to_llr(prior)
        self._prior = jnp.asarray(self.prior_llr)
        self.noise_model = noise_model
        self.storage_sim = sim
        if self._osd is not None:
            # the host corrector's BP program is cached by structure; only
            # its prior vector changes here
            self._osd = self._build_osd_corrector()
        return self

    def run_host_sampled(self, seed: int, shots: Optional[int] = None):
        """Same decode program, records from the CPU oracle sampler.

        Cross-validates the device Pauli-frame sampler end-to-end: decoder
        and every downstream step are IDENTICAL to :meth:`run`, so any
        statistical disagreement isolates to the samplers."""
        from ..sampler.reference import FrameSampler

        S = shots if shots is not None else self.shots_per_device
        fs = FrameSampler(self.storage_sim.circuit, seed=seed)
        record = jnp.asarray(fs.sample(S), dtype=jnp.float32)
        f, s, u = jax.jit(self._decode_records)(record, self._dense_ops, self._prior)
        return int(f), int(s), int(u)
