"""Interrupted-run trap: a termination signal writes an autosave, and a
relaunch resumes from it (reference failure-handling semantics)."""

import os
import signal
import subprocess
import sys
import time


def test_sigterm_writes_autosave_and_resume(tmp_path):
    out = tmp_path / "out"
    param = tmp_path / "p.py"
    param.write_text(
        "initial_conditions = {'species': 'matter', 'N': 6**3}\n"
        "potential_options = 16\n"
        f"output_dirs = '{out}'\n"
        "output_times = {'powerspec': 1.0}\n"
        "a_begin = 0.02\n"
        f"boxsize = 128*Mpc\n"
    )
    code = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from concept_tpu.cli import main; "
        f"sys.exit(main(['-p', r'{param}']))"
    )
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", code], cwd=tmp_path,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    # wait until the evolution is underway, then interrupt
    deadline = time.time() + 300
    started = False
    for line in proc.stdout:
        if "Evolving" in line:
            started = True
            time.sleep(8)  # let a few steps run
            proc.send_signal(signal.SIGTERM)
            break
        if time.time() > deadline:
            proc.kill()
            raise AssertionError("run never started evolving")
    assert started
    tail = proc.stdout.read()
    proc.wait(timeout=120)
    assert "writing autosave" in tail, f"tail={tail!r}"
    auxes = list(tmp_path.rglob("auxiliary.json"))
    assert auxes, tail

    # relaunch: must resume from the autosave and complete
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=tmp_path, capture_output=True,
        text=True, timeout=560,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "esum" in r.stdout or "autosave" in r.stdout.lower(), r.stdout
    assert "Simulation complete" in r.stdout
    assert (out / "powerspec_a=1.txt").exists()
