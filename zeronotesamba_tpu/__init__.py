"""zeronotesamba_tpu — a TPU-native self-supervised beat-tracking framework.

Re-designed from scratch for JAX/XLA/Pallas with the full capability surface of
the ZeroNS reference (deezer/zeroNoteSamba):

- ``ops``         batched on-device DSP (VQT/CQT front-end, resampling, RMS, HPSS)
- ``models``      Flax conv encoder / beat head / twin-pretext / fused downstream
- ``losses``      vectorized NT-Xent (local + cross-device global), masked BCE
- ``decode``      beat decoders: threshold, Ellis DP, DBN/HMM (madmom-equivalent)
- ``metrics``     beat F-measure, continuity (CML/AML), information gain
- ``data``        WAV I/O, dataset ETL (Ballroom/GTZAN/Hainsworth/SMC), FMA pair
                  mining, RMS gating, synthetic click-track generators
- ``train``       pjit/shard_map training engines (pretext contrastive +
                  downstream supervised) with orbax checkpoint/resume
- ``parallel``    device mesh + sharding rules (dp over batch, sp over time)
- ``experiments`` config-driven drivers: pretext, beat (8-fold CV), cross-data,
                  few-shot, measures, old-school baseline
"""

__version__ = "0.1.0"
