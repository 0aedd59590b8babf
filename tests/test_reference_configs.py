"""Parity of the reference's per-stage driver configs.

The de-facto ground truth for what the reference runs is the flag sets in
``data/{frame_main,restore}/resize*/run.py`` (SURVEY §2.1/§5.6).  These
tests parse the ACTUAL reference scripts and map every OPTDENSE flag
through core.config.CLI_FLAG_MAP, proving a user can port a reference
stage invocation 1:1.  Skipped when the reference tree is absent.
"""

import os
import re

import pytest

REF_DATA = "/root/reference/data"

# app-level flags (I/O, threading, verbosity, fusion dispatch) that are
# handled by the pipeline drivers rather than DenseConfig
_APP_FLAGS = {
    "input-file", "w", "o", "verbosity", "fusion-mode", "max-threads",
    "filter-point-cloud",
}


def _parse_run_py(path):
    """Extract the DensifyPointCloud flag->value pairs from a run.py."""
    text = open(path, encoding="utf-8", errors="replace").read()
    # tokens appear as "--flag", "value" string pairs
    toks = re.findall(r'"([^"]+)"', text)
    flags = {}
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.startswith("--"):
            name = t[2:]
            if i + 1 < len(toks) and not toks[i + 1].startswith("--"):
                flags[name] = toks[i + 1]
                i += 2
                continue
        i += 1
    return flags


def _stage_paths():
    out = []
    if not os.path.isdir(REF_DATA):
        return out
    for variant in ("frame_main", "restore"):
        base = os.path.join(REF_DATA, variant)
        if not os.path.isdir(base):
            continue
        for stage in sorted(os.listdir(base)):
            p = os.path.join(base, stage, "run.py")
            if os.path.exists(p):
                out.append(p)
    return out


@pytest.mark.skipif(not _stage_paths(), reason="no reference data tree")
@pytest.mark.parametrize("path", _stage_paths(),
                         ids=lambda p: "/".join(p.split(os.sep)[-3:-1]))
def test_reference_stage_flags_map_one_to_one(path):
    from hcmvs_tpu.core.config import CLI_FLAG_MAP, config_from_cli_flags
    flags = _parse_run_py(path)
    assert flags, f"no flags parsed from {path}"
    dense_flags = {k: v for k, v in flags.items() if k not in _APP_FLAGS}
    unmapped = [k for k in dense_flags if k not in CLI_FLAG_MAP]
    assert not unmapped, f"reference flags without a config mapping: " \
                         f"{unmapped}"
    cfg = config_from_cli_flags(dense_flags)
    # spot-check the canonical stage (SURVEY cites resize2 as the
    # ground-truth parameterization)
    if "frame_main/resize2" in path.replace(os.sep, "/"):
        assert cfg.estimation_iters == 3
        assert cfg.estimation_iters_external == 4
        assert cfg.photo2geo == 1
        assert cfg.use_optical_flow == 1
        assert cfg.init_triangulate == 0
        assert cfg.photometric_flow == pytest.approx(0.26)
        assert cfg.para_tapa == pytest.approx(0.26)
        assert cfg.adapt_half_window == 7
        assert cfg.propagate_half_window == 5
        assert cfg.propagate_step == 4
        assert cfg.tx_threshold == 150
        assert cfg.num_views == 10
    if "/restore/" in path.replace(os.sep, "/"):
        assert cfg.init_triangulate == 1, path


@pytest.mark.skipif(not _stage_paths(), reason="no reference data tree")
def test_run_sh_schedule_shape():
    """run.sh's 5-stage alternating schedule matches default_schedule's
    level/variant sequence (ref: /root/reference/run.sh)."""
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.pipeline.hierarchy import default_schedule
    sh = open("/root/reference/run.sh").read()
    # one stage per `python3 run.py <images> /<variant>/resize<k>`
    # invocation ("main_frame" is the script's typo for frame_main)
    order = re.findall(r"run\.py \S+ /(\w+)/resize(\d)", sh)
    assert order, "run.sh stages not found"
    want = [("B" if v == "restore" else "A", int(r)) for v, r in order]
    sched = default_schedule(DenseConfig())
    got = [(s.variant, s.level) for s in sched]
    assert got == want, (got, want)
