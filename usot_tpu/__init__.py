"""USOT-TPU: a TPU-native unsupervised single-object tracking framework
with the full capabilities of VISION-SJTU/USOT (ICCV 2021).

Key entry points:
  usot_tpu.models.usot.build_usot       — the flagship tracker network
  usot_tpu.tracker.tracker.USOTTracker  — reference-parity init/track API
  usot_tpu.tracker.engine.ScanEngine    — on-device scan tracking engine
  usot_tpu.cli.{train,test,evaluate,onekey,parse_flow}
"""

__version__ = "0.1.0"
