"""Batch-job submission: script generation + scheduler handoff
(reference concept:835-847 detection, 2315-2660 script construction).
"""

import os
import stat
import subprocess
import sys

import pytest

from concept_tpu.submit import build_job_script, detect_scheduler
from concept_tpu import cli


def test_slurm_script_headers(tmp_path):
    text = build_job_script(
        "slurm",
        ["-p", "param.py", "--submit", "-q", "gpu", "-w", "12:00:00",
         "--memory", "64G"],
        jobname="myjob", logfile="/j/log", errfile="/j/err",
        queue="gpu", walltime="12:00:00", memory="64G", nprocs=4,
        directives=["--account=cosmo"],
    )
    assert "#SBATCH --job-name=myjob" in text
    assert "#SBATCH --partition=gpu" in text
    assert "#SBATCH --time=12:00:00" in text
    assert "#SBATCH --mem=64G" in text
    assert "#SBATCH --account=cosmo" in text
    # submission flags stripped, --local appended
    run_line = text.strip().splitlines()[-1]
    assert "--submit" not in run_line
    assert "-q" not in run_line.split()
    assert run_line.endswith("--local")
    assert "-m concept_tpu" in run_line
    assert "param.py" in run_line


def test_torque_script_headers():
    text = build_job_script(
        "torque", ["-p", "p.py"], jobname="j", logfile="L", errfile="E",
        queue="batch", walltime="01:00:00", memory="8gb", nprocs=2,
    )
    assert "#PBS -N j" in text
    assert "#PBS -q batch" in text
    assert "#PBS -l walltime=01:00:00" in text
    assert "#PBS -l nodes=1:ppn=2" in text
    assert 'cd "$PBS_O_WORKDIR"' in text


def test_detect_scheduler_forced(monkeypatch):
    monkeypatch.setenv("CONCEPT_TPU_SCHEDULER", "torque")
    assert detect_scheduler() == "torque"
    monkeypatch.setenv("CONCEPT_TPU_SCHEDULER", "slurm")
    assert detect_scheduler() == "slurm"
    monkeypatch.setenv("CONCEPT_TPU_SCHEDULER", "nonsense")
    assert detect_scheduler() is None


def test_submit_end_to_end(tmp_path, monkeypatch):
    """--submit writes job/<id>/jobscript + param copy and calls the
    (stubbed) scheduler with the script path."""
    monkeypatch.chdir(tmp_path)
    param = tmp_path / "tiny.py"
    param.write_text("boxsize = 16 * Mpc\n")
    record = tmp_path / "sbatch_args.txt"
    stub = tmp_path / "sbatch"
    stub.write_text(
        f"#!/usr/bin/env bash\necho \"$@\" > {record}\necho Submitted batch job 42\n"
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("CONCEPT_TPU_SCHEDULER", "slurm")
    monkeypatch.setenv("CONCEPT_TPU_SUBMIT_CMD", str(stub))
    rc = cli.main(["-p", str(param), "--submit", "-w", "00:10:00"])
    assert rc == 0
    script = tmp_path / "job" / "0" / "jobscript"
    assert script.exists()
    assert (tmp_path / "job" / "0" / "param").exists()
    assert "job/0/jobscript" in record.read_text()
    text = script.read_text()
    assert "#SBATCH --time=00:10:00" in text
    assert os.access(script, os.X_OK)


def test_submit_no_scheduler(tmp_path, monkeypatch, capsys):
    """Without sbatch/qsub the script is still generated, path printed,
    nonzero exit (the artifact remains useful on scheduler-less VMs)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("CONCEPT_TPU_SCHEDULER", "")
    monkeypatch.setenv("PATH", str(tmp_path))  # hide any real sbatch/qsub
    rc = cli.main(["-p", "/nonexistent_param_placeholder.py", "--submit"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "jobscript" in err
