"""Physical-error-rate sweep driver.

Behavioral parity with ``/root/reference/python/qldpc/misc/p_sweep.py``:
same CLI surface (code file, --samples, --p_sweep "(lo,hi,points)",
--rounds, --decoder_mode, --linspace, BP+OSD options) and the same CSV
output schema (p_ph, failures, samples, walltime + flattened decoder
options).

The parallelism is re-designed for the hardware: where the reference forks a
``multiprocessing.Pool`` of CPU workers each decoding shot-by-shot
(``p_sweep.py:17-29``), here every sweep point is ONE batched
sample+decode call (device sampler + vectorized BP, OSD on the few BP
failures) — optionally sharded over a device mesh by the caller via
:mod:`exp_ldpc_tpu.parallel`.
"""
from __future__ import annotations

import json
import re
import sys
from argparse import ArgumentParser
from datetime import datetime
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..decoders.drivers import add_bposd_args, load_code, run_simulation, unpack_bposd_args
from ..utils.observability import get_logger

__all__ = ["p_sweep", "p_sweep_main", "parse_sweep_spec"]

_log = get_logger("p_sweep")


def _load_checkpoint(path: Path):
    """Completed sweep-point records from a JSONL checkpoint (resume support).

    The reference has no partial-sweep resume at all — a crashed Pool loses
    the whole sweep (SURVEY.md §5 'Checkpoint / resume').  Here every
    completed point is appended to the checkpoint file as one JSON line, and
    an interrupted sweep restarted with the same checkpoint skips them.
    """
    records = []
    if path.exists():
        with path.open() as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
    return records


def p_sweep(samples, p_values, noise_model, noise_model_args, meas_prior, data_prior,
            seed=None, use_device_sampler=None, checkpoint: Optional[Path] = None,
            **kwargs):
    """Sweep physical error rates; returns a pandas DataFrame of records.

    With ``checkpoint`` set, completed points are streamed to a JSONL file
    and a restarted sweep resumes after the last completed point.
    """
    import pandas as pd

    data = []
    done_p = set()
    if checkpoint is not None:
        checkpoint = Path(checkpoint)
        data = _load_checkpoint(checkpoint)
        done_p = {round(float(rec["p_ph"]), 12) for rec in data}
        if data:
            _log.info("resuming sweep: %d completed points in %s", len(data), checkpoint)

    for i, p_ph in enumerate(p_values):
        if round(float(p_ph), 12) in done_p:
            continue
        time_start = datetime.now()
        logical_values = run_simulation(
            samples,
            noise_model=noise_model,
            noise_model_args=noise_model_args(p_ph),
            meas_prior=lambda xs, zs, p=p_ph: meas_prior(p, xs, zs),
            data_prior=lambda xs, zs, p=p_ph: data_prior(p, xs, zs),
            seed=(seed + i if seed is not None else None),
            use_device_sampler=use_device_sampler,
            **kwargs,
        )
        runtime = (datetime.now() - time_start).total_seconds()
        point = {
            "p_ph": p_ph,
            "failures": sum(logical_values),
            "samples": len(logical_values),
            "walltime": runtime,
            **kwargs,
            **(kwargs["bp_osd_options"]),
        }
        del point["code"]
        del point["bp_osd_options"]
        _log.info("p=%g: %d/%d failures in %.1fs", p_ph, point["failures"],
                  point["samples"], runtime)
        data.append(point)
        if checkpoint is not None:
            def _jsonable(v):
                if hasattr(v, "item"):  # numpy scalars
                    v = v.item()
                return v if isinstance(v, (int, float, str, bool, type(None))) else repr(v)
            with checkpoint.open("a") as f:
                json.dump({k: _jsonable(v) for k, v in point.items()}, f)
                f.write("\n")
    return pd.DataFrame.from_records(data)


sweep_spec_re = re.compile(r"^\s*[(](.+),(.+),(.+)[)]\s*$")


def parse_sweep_spec(x: str) -> Tuple[float, float, int]:
    """Parse "(a, b, c)" with a <= b floats and c > 0 int (reference ``:45-55``)."""
    result = sweep_spec_re.match(x)
    if result is None:
        raise RuntimeError(
            "Unable to parse sweep specification, expecting (a, b, c) where a,b : float, "
            "c : int, a<=b, and c > 0. Ex: (0.3, 1e3, 10)"
        )
    lower, upper, points = (g for g in result.group(1, 2, 3))
    lower, upper, points = float(lower), float(upper), int(points)
    if points <= 0 or lower > upper:
        raise RuntimeError("Number of points non-positive or lower bound exceeded upper bound")
    return (lower, upper, points)


def p_sweep_main(noise_model_args, noise_model, meas_prior, data_prior):
    """argparse main (reference ``:57-78``)."""
    parser = ArgumentParser(
        description="Perform a batched sweep in the physical error rate for the given "
        "quantum code under BP+OSD"
    )
    parser.add_argument("code", type=Path)
    parser.add_argument("--samples", type=int, help="Number of samples to take")
    parser.add_argument(
        "--p_sweep",
        type=parse_sweep_spec,
        help="Specify lower and upper bounds of the sweep + number of points in the form "
        "(lower, upper, points)",
    )
    parser.add_argument("--rounds", type=int, help="Number of rounds of syndrome extraction", default=1)
    parser.add_argument(
        "--decoder_mode",
        choices=["bposd", "bposd_single_shot", "bposd_hybrid", "bpd_detector",
                 "relay_bp", "sliding_window", "ssf_single_shot"],
        help="Operate decoder in BP+OSD, BP+OSD (single shot), hybrid BP + (BP+OSD), "
        "detector-model BP, the OSD-free relay-BP ensemble, streaming "
        "sliding-window BP+OSD, or single-shot small-set-flip",
        default="bposd",
    )
    parser.add_argument(
        "--linspace",
        type=bool,
        help="Perform the sweep with linearly spaced points. The default is uniform spacing "
        "in log space",
        default=False,
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--cpu_sampler", action="store_true", help="Use the CPU oracle sampler instead of the device sampler"
    )
    parser.add_argument(
        "--checkpoint", type=Path, default=None,
        help="JSONL file to stream completed sweep points to; re-running with "
        "the same file resumes after the last completed point",
    )
    add_bposd_args(parser)

    args = parser.parse_args(sys.argv[1:])
    code = load_code(args)
    bp_osd_options = unpack_bposd_args(args, code)

    sweep = np.linspace(*args.p_sweep) if args.linspace else np.geomspace(*args.p_sweep)

    result = p_sweep(
        samples=args.samples,
        code=code,
        rounds=args.rounds,
        noise_model=noise_model,
        noise_model_args=noise_model_args,
        meas_prior=meas_prior,
        data_prior=data_prior,
        p_values=sweep,
        decoder_mode=args.decoder_mode,
        bp_osd_options=bp_osd_options,
        seed=args.seed,
        use_device_sampler=not args.cpu_sampler,
        checkpoint=args.checkpoint,
    )
    result.to_csv(sys.stdout)


def cli_main():
    """Console entry point: pheno noise with the reference's 2/3*p prior
    (``/root/reference/scripts/p_sweep.py:4-11``)."""
    from ..circuits.noise import depolarizing_noise

    p_sweep_main(
        noise_model_args=lambda p: {"p": p, "pm": p},
        noise_model=depolarizing_noise,
        meas_prior=lambda p, x_steps, z_steps: 2 / 3 * p,
        data_prior=lambda p, x_steps, z_steps: 2 / 3 * p,
    )


if __name__ == "__main__":
    cli_main()
