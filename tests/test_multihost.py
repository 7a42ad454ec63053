"""Multi-host execution: 2 jax.distributed processes x 4 virtual CPU devices
must produce output identical to the single-process 8-device sharded run.

Covers: jax.distributed init, process-major global mesh, per-process input
block sharding, process-local output fetching, per-host .out/fastsummary
files, and the empty-local-tail-batch lockstep case (the fixture's 400 reads
leave a 16-read tail that lands entirely on process 0).
"""

import os
import socket
import subprocess
import sys

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from lmat_tpu.cli.main import main
main(sys.argv[1:])
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_run_matches_single(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)

    def proc(pid):
        return subprocess.Popen(
            [
                sys.executable, str(driver),
                "--lmat-dir", FIX, "read-label",
                "-d", str(tmp_path / "db"),
                "-i", f"{FIX}/reads.fa", "-c", f"{FIX}/taxtree.dat",
                "-e", f"{FIX}/depth.dat", "-w", f"{FIX}/ranks.dat",
                "-u", f"{FIX}/taxids.info", "-n", f"{FIX}/null_lst.txt",
                "-o", str(tmp_path / "mh"), "--mode", "fast", "--batch", "64",
                "--max-candidates", "64",
                "--mesh", "2,4",
                "--distributed", f"localhost:{port},2,{pid}",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )

    # build the DB once (shared by both processes and the reference run)
    from lmat_tpu.apps.make_db import build_from_tax_histo

    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    idx.save(str(tmp_path / "db"))

    p0, p1 = proc(0), proc(1)
    out0, err0 = p0.communicate(timeout=900)
    out1, err1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, f"proc0 failed:\n{out0}\n{err0[-4000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1}\n{err1[-4000:]}"

    lines_mh = []
    for pid in (0, 1):
        with open(tmp_path / f"mh{pid}.out") as f:
            lines_mh.extend(l.rstrip("\n") for l in f if l.strip())

    # single-process 8-device reference with identical step shapes
    from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
    from lmat_tpu.apps.read_label_sharded import make_sharded_classifier
    from lmat_tpu.apps.read_label_score_device import DeviceScorerConfig
    from lmat_tpu.core.nullmodel import NullModel
    from lmat_tpu.core.taxonomy import Taxonomy
    from lmat_tpu.io.fasta import iter_reads_lmat
    from lmat_tpu.parallel.mesh import make_mesh

    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    null = NullModel.load(FIX + "/null_lst.txt", lmat_dir=FIX)
    cfg = DeviceScorerConfig(max_candidates=64, min_kmer=30)
    mesh = make_mesh(data=2, db=4)
    _, single = make_sharded_classifier(
        mesh, idx, tax, cfg, null_model=null, k=20, batch=64, read_len=256
    )
    single.set_fallback(
        Classifier(tax, idx, ScoreOptions(min_kmer=30, prn_all=True), null_model=null)
    )
    reads = [
        (h or f"unknown_hdr:{i + 1}", s)
        for i, (h, s) in enumerate(iter_reads_lmat(FIX + "/reads.fa"))
    ]
    lines_single = []
    for s0 in range(0, len(reads), 64):
        b = reads[s0 : s0 + 64]
        lines_single.extend(single._format(b, single.step(single.pad(b))))
    lines_single = [l.rstrip("\n") for l in lines_single if l.strip()]

    # read->host distribution is deterministic here (block sharding), but the
    # concatenation order across host files interleaves: compare as sets like
    # the reference's per-thread .out comparison (SURVEY.md §9)
    assert sorted(lines_mh) == sorted(lines_single)

    # per-host summaries merge to the single run's totals
    import re

    total = 0
    for pid in (0, 1):
        fs = tmp_path / f"mh.0.30.shard{pid}.fastsummary"
        assert fs.exists(), f"missing per-host fastsummary for proc {pid}"
        with open(fs) as f:
            for line in f:
                parts = line.split("\t")
                if len(parts) >= 3:
                    total += int(parts[1])
    assert total == sum(single.track_count.values())
