"""galileo_sdr_sim_tpu: TPU-native Galileo E1 OS baseband signal simulator.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
harshadms/galileo-sdr-sim: RINEX-driven Galileo E1B/C (BOC(1,1), live
I/NAV) baseband synthesis at 2.6 Msps int16 I/Q, with file and SDR sinks,
live position/bit-stream inputs, and satellite/time sharding across TPU
meshes.
"""

__version__ = "0.1.0"
