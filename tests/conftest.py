"""Test configuration: force an 8-device virtual CPU mesh before JAX
backends initialize.

Sharding tests exercise real Mesh/shard_map paths on virtual CPU devices
(multi-chip TPU hardware is not needed to validate the partitioning).
The environment may preset JAX_PLATFORMS (e.g. a TPU relay) and a
sitecustomize may have imported jax already, so both the env vars and the
jax config are set here — backends are created lazily, so this works as
long as no array op ran yet."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
RINEX = REFERENCE / "rinex_files" / "20feb2022.rnx"
TV_DIR = REFERENCE / "tv" / "20_FEB_2022_GST_08_00_01"


@pytest.fixture(scope="session")
def nav():
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3

    return read_rinex_v3(RINEX)


@pytest.fixture(scope="session")
def g0(nav):
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.scenario import scenario_start_time

    return scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))


@pytest.fixture(scope="session")
def engine_1s(nav, g0):
    from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

    return ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=1.0,
    )


@pytest.fixture(scope="session")
def batch_1s(engine_1s):
    return list(engine_1s.batches(8))[0]
