"""CLI tests (reference: src/main.cpp option surface)."""

import subprocess
import sys

import numpy as np
import pytest

from galileo_sdr_sim_tpu.cli import build_parser, load_user_motion


def test_flag_parsing():
    p = build_parser()
    args = p.parse_args(
        ["-e", "nav.rnx", "-o", "out.bin", "-l", "1.5,-2.5,100",
         "-t", "2022/02/20,08:00:01", "-d", "30", "-U", "1", "-b", "1", "-v"]
    )
    assert args.navfile == "nav.rnx"
    assert args.outfile == "out.bin"
    assert args.llh == "1.5,-2.5,100"
    assert args.duration == 30.0
    assert args.disable_usrp == "1"
    assert args.disable_bitstream == "1"
    assert args.verbose


def test_defaults_match_reference():
    args = build_parser().parse_args(["-e", "nav.rnx"])
    # main.cpp:186-196: default duration 300 s, USRP on, bit stream on,
    # default Boston-ish location, default outfile name
    assert args.duration == 300.0
    assert args.disable_usrp is None
    assert args.disable_bitstream is None
    assert args.outfile == "galileosim.ishort"
    assert args.llh.startswith("42.3601")


def test_missing_navfile_errors():
    from galileo_sdr_sim_tpu.cli import main

    assert main([]) == 1


def test_invalid_time_rejected():
    from galileo_sdr_sim_tpu.cli import _parse_time

    with pytest.raises(SystemExit):
        _parse_time("2022/13/01,00:00:00")
    with pytest.raises(SystemExit):
        _parse_time("1979/01/01,00:00:00")
    g = _parse_time("2022/02/20,08:00:01")
    assert g.week == 2198


def test_user_motion_llh(tmp_path):
    f = tmp_path / "motion.csv"
    f.write_text("42.0,-71.0,100\n42.001,-71.0,100\n")
    traj = load_user_motion(f)
    assert traj.shape == (2, 3)
    assert traj[0, 0] == 42.0


def test_user_motion_ecef(tmp_path):
    from galileo_sdr_sim_tpu.geodesy import llh2xyz

    xyz = llh2xyz(np.array([0.7, -1.2, 100.0]))
    f = tmp_path / "motion.csv"
    f.write_text(f"0.0,{xyz[0]},{xyz[1]},{xyz[2]}\n")
    traj = load_user_motion(f)
    assert traj.shape == (1, 3)
    assert np.isclose(traj[0, 0], np.degrees(0.7), atol=1e-6)
    assert np.isclose(traj[0, 2], 100.0, atol=0.1)
