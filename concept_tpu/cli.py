"""Command-line interface — the single entry point.

TPU-native counterpart of the reference bash launcher `concept`
(reference concept:854-1315 for the option surface, 2737-2747 for the
run/logging behavior).  No mpiexec/Slurm layer is needed: a run is one
JAX process driving the local chips; job logs are tee'd under
job/<jobid>/log like the reference.

Usage:
  concept-tpu -p params.py [-c "extra=1"] [-u powerspec path ...]
  python -m concept_tpu -p params.py
"""

from __future__ import annotations

import argparse
import os
import sys


def _env_default(long_name: str, default, action=None):
    """CONCEPT_*-style environment mirrors (reference concept:1017-1035:
    every long option's default can be supplied as CONCEPT_<name>, with
    dashes mapped to underscores — e.g. CONCEPT_param, CONCEPT_nprocs,
    CONCEPT_pure_python=True)."""
    val = os.environ.get("CONCEPT_" + long_name.lstrip("-").replace("-", "_"))
    if val is None:
        return default
    if action == "store_true":
        return val.strip().lower() in ("1", "true", "t", "yes", "y", "on")
    if action == "append":
        return [val]
    return val


def make_parser():
    p = argparse.ArgumentParser(
        prog="concept-tpu",
        description="TPU-native cosmological N-body + fluid simulation framework",
    )

    _add_argument = p.add_argument

    def add_argument(*names, **kwargs):
        long = next((n for n in names if n.startswith("--")), None)
        if long is not None and kwargs.get("nargs") is not argparse.REMAINDER:
            action = kwargs.get("action")
            kwargs["default"] = _env_default(
                long, kwargs.get("default"), action)
        return _add_argument(*names, **kwargs)

    p.add_argument = add_argument
    p.add_argument("-p", "--param", help="parameter file (executable Python)")
    p.add_argument(
        "-c", "--command-line-params", action="append", default=[],
        help="extra parameter statements, run after the parameter file",
    )
    p.add_argument(
        "-u", "--utility", nargs=argparse.REMAINDER,
        help="run a utility: powerspec|bispec|info|convert|render3D|class <args>",
    )
    p.add_argument("-n", "--nprocs", default="1",
                   help="device count for the grid mesh: N (1D slabs), "
                        "AxB (2D pencils, e.g. 2x4), 0 = all available, "
                        "1 = single device (default)")
    p.add_argument("-m", "--main", dest="main_script", default=None,
                   help="run a custom Python script instead of the time "
                        "loop, with the loaded RunConfig as `cfg` and the "
                        "unit system in scope (reference `-m MAIN`; its "
                        "tests' analyze.py pattern)")
    p.add_argument("-t", "--test", nargs="?", const="all", default=None,
                   help="run the test suite (optionally a single test "
                        "file/pattern), reference `concept -t` analogue")
    p.add_argument("--seed", type=int, default=None, help="override primordial seed")
    p.add_argument("--version", action="store_true")
    p.add_argument("--submit", action="store_true",
                   help="generate a Slurm/TORQUE-PBS batch script under "
                        "job/<id>/jobscript and submit it (reference "
                        "concept:2315-2660)")
    p.add_argument("-q", "--queue", default=None,
                   help="scheduler queue/partition for --submit")
    p.add_argument("-w", "--walltime", default=None,
                   help="walltime for --submit (e.g. 12:00:00)")
    p.add_argument("--memory", default=None,
                   help="memory request for --submit (e.g. 64G)")
    p.add_argument("-J", "--job-name", default=None,
                   help="job name for --submit (default: param file stem)")
    p.add_argument("--job-directive", action="append", default=[],
                   help="extra raw scheduler directive line(s) for --submit")
    p.add_argument("--local", action="store_true",
                   help="run in this process even when a scheduler is "
                        "present (reference --local)")
    p.add_argument("-i", "--interactive", action="store_true",
                   help="after the run (or with no run), drop into an "
                        "interactive Python session with cfg/units (and "
                        "sim/state/a after a run) in scope (reference -i)")
    p.add_argument("--float64", action="store_true",
                   help="run in float64 end-to-end (the validation tier;"
                        " equivalent to enable_float64 = True)")
    p.add_argument("--pure-python", action="store_true",
                   help="eager (non-jit) execution for debugging "
                        "(reference --pure-python analogue)")
    return p


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    args = make_parser().parse_args(argv)
    if args.submit and not args.local:
        from concept_tpu.submit import submit

        return submit(args, list(argv))
    if args.version:
        from concept_tpu import __version__

        print(f"concept_tpu {__version__}")
        return 0
    if args.test is not None:
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        target = os.path.join(repo, "tests")
        cmd = [sys.executable, "-m", "pytest", "-q"]
        if args.test == "all":
            cmd.append(target)
        elif os.path.exists(args.test):
            cmd.append(args.test)
        else:
            cmd += [target, "-k", args.test]
        return subprocess.call(cmd)
    if args.utility:
        from concept_tpu.utilities import delegate

        return delegate(args.utility, args)
    if (not args.param and not args.command_line_params
            and not args.main_script and not args.interactive):
        print("nothing to do (pass -p/--param, -u/--utility, -m SCRIPT "
              "or -i)", file=sys.stderr)
        return 1
    if args.pure_python:
        import jax

        jax.config.update("jax_disable_jit", True)
    from concept_tpu.param import load_params
    from concept_tpu.run import run

    cfg = load_params(args.param, overrides=args.command_line_params)
    if args.float64:
        cfg.enable_float64 = True
    if args.main_script:
        # custom main (reference `-m MAIN`, concept:1040-1315): execute
        # the script with the canonicalized config and units in scope —
        # the reference tests' analyze.py pattern
        from concept_tpu.units import UnitSystem

        usys = cfg.units or UnitSystem(cfg.unit_length, cfg.unit_time,
                                       cfg.unit_mass)
        ns = {
            "__name__": "__main__",
            "__file__": os.path.abspath(args.main_script),
            "cfg": cfg,
            "units": usys,
        }
        with open(args.main_script) as f:
            code = compile(f.read(), args.main_script, "exec")
        exec(code, ns)  # noqa: S102 — user-supplied script, by request
        return 0
    with job_logging() as jobid:
        print(f"concept_tpu run, job {jobid}")
        result = None
        # `-i` with only -c snippets: configure-and-inspect, no run
        # (pass -p to simulate first, then land in the session)
        if args.param or (args.command_line_params and not args.interactive):
            result = run(cfg, seed=args.seed, n_devices=args.nprocs)
        if args.interactive:
            # reference `-i`: an interactive session with the framework
            # set up (concept option list, concept:1040-1315)
            import code
            from concept_tpu.units import UnitSystem

            ns = {
                "cfg": cfg,
                "units": cfg.units or UnitSystem(
                    cfg.unit_length, cfg.unit_time, cfg.unit_mass),
            }
            if result is not None:
                ns["sim"], ns["state"], ns["a"] = result
            code.interact(
                banner="concept_tpu interactive session "
                       f"(in scope: {', '.join(sorted(ns))})",
                local=ns,
            )
    return 0


class _Tee:
    def __init__(self, *streams):
        self.streams = streams

    def write(self, data):
        for s in self.streams:
            s.write(data)

    def flush(self):
        for s in self.streams:
            s.flush()

    def isatty(self):
        return self.streams[0].isatty()

    def close(self):
        # never close the real stdout/stderr (streams[0]); only the log
        # file — absl's logging shutdown calls close() at exit
        for s in self.streams[1:]:
            try:
                s.close()
            except Exception:
                pass


from contextlib import contextmanager


@contextmanager
def job_logging(job_dir: str = "job"):
    """Tee stdout/stderr to job/<jobid>/{log,log_err}
    (reference concept:2737-2747; jobid allocation concept:2703-2719)."""
    os.makedirs(job_dir, exist_ok=True)
    existing = [int(d) for d in os.listdir(job_dir) if d.isdigit()]
    jobid = max(existing, default=-1) + 1
    d = os.path.join(job_dir, str(jobid))
    os.makedirs(d, exist_ok=True)
    out = open(os.path.join(d, "log"), "w")
    err = open(os.path.join(d, "log_err"), "w")
    so, se = sys.stdout, sys.stderr
    sys.stdout = _Tee(so, out)
    sys.stderr = _Tee(se, err)
    try:
        yield jobid
    finally:
        sys.stdout, sys.stderr = so, se
        out.close()
        err.close()


if __name__ == "__main__":
    sys.exit(main())
