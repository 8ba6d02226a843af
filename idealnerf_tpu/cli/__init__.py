"""Command-line entry points mirroring the reference scripts:

  python -m idealnerf_tpu.cli.train_head  --config <cfg.txt>   (audio_exp_nerf.py)
  python -m idealnerf_tpu.cli.train_baseline --config <cfg>    (baseline.py)
  python -m idealnerf_tpu.cli.train_torso --config <cfg.txt>   (run_nerf.py/train_torso.py)
  python -m idealnerf_tpu.cli.eval_reenact --datadir A --evalExpr_path B.json
        --aud_file aud_b.npy --save_path out/                  (eval_aud_exp_nerf.py)

Every flag of the reference parsers (helper.py:16-138) is accepted; the
--config file uses the reference's key=value format. ``--synthetic N``
swaps in the procedural dataset for hardware-free dry runs.
"""
