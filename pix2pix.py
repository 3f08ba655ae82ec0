#!/usr/bin/env python3
"""Pix2Pix CLI — public surface parity with the reference's pix2pix.py
(:341-461): same flags, same --train/--predict modes, same timestamped output
directory contract (logs/Log.txt, config.json, metrics JSONs, figs/,
test_images/, final_test_imgs/, training_checkpoints/, prediction_images/),
plus TPU-native extensions (--dtype, --num-devices, --bn-cross-replica,
--resume).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from gan_tpu.config import Pix2PixConfig, parse_pix2pix
from gan_tpu.data.pipeline import build_pix2pix_cache
from gan_tpu.data.split import list_images, pix2pix_split
from gan_tpu.train.checkpoint import CheckpointManager, latest_checkpoint_dir
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
from gan_tpu.utils import dump_json, make_run_dirs, redirect_logging, write_loss_figs


def main(cfg: Pix2PixConfig) -> None:
    os.environ["GAN_TPU_PALLAS"] = cfg.use_pallas           # kernel-path gate
    if os.environ.get("GAN_TPU_MULTIHOST") == "1":          # pod-scale DP opt-in
        from gan_tpu.parallel.mesh import init_multihost
        init_multihost()
    dirs = make_run_dirs(cfg.output)                        # ref pix2pix.py:384-392
    if cfg.logging == "true":
        redirect_logging(dirs)                              # ref pix2pix.py:393-395

    trainer = Pix2PixTrainer(cfg)
    cfg.dump(os.path.join(dirs.logs, "config.json"))        # ref pix2pix.py:406-407

    print("\nReading in and processing images.\n", flush=True)
    contents = list_images(cfg.data)
    assert contents, "No images found in data directory!"   # ref pix2pix.py:126

    from gan_tpu.data.augment import JITTER_PAD
    from gan_tpu.data.loader import FileCache, host_cache_fits

    def cache(names, train, allow_stream=False):
        """Decoded uint8 host cache, or a FileCache streaming from disk when
        the decoded corpus exceeds host RAM / --host-cache off (replaces
        tf.data's per-step disk streaming, ref pix2pix.py:155-163)."""
        paths = [os.path.join(cfg.data, n) for n in names]
        size = cfg.img_size + (JITTER_PAD if train else 0)
        sample_shape = (2, size, size, cfg.n_channels)
        est = len(paths) * int(np.prod(sample_shape))
        if allow_stream and not host_cache_fits(est, cfg.host_cache):
            print(f"Host cache disabled for {len(paths)} files — streaming "
                  "from disk.", flush=True)
            return FileCache(
                paths,
                lambda p: build_pix2pix_cache(
                    [p], img_size=cfg.img_size, channels=cfg.n_channels,
                    orient=cfg.input_img_orient, train=train)[0],
                sample_shape, cfg.batch_size)
        return build_pix2pix_cache(paths, img_size=cfg.img_size,
                                   channels=cfg.n_channels,
                                   orient=cfg.input_img_orient, train=train)

    if cfg.predict:                                          # ref pix2pix.py:409-412
        predict_cache = cache(contents, train=False, allow_stream=True)
        mgr = CheckpointManager(latest_checkpoint_dir(cfg.weights))
        trainer.load_state(mgr.restore(trainer.state()))
        trainer.predict(predict_cache, dirs.root,
                        raw=cfg.raw_predictions == "true", raw_names=contents)

    if cfg.train:                                            # ref pix2pix.py:414-454
        train_names, val_names, test_names = pix2pix_split(
            contents, seed=cfg.seed, test_img=cfg.test_img,
            validation_size=cfg.validation_size)
        train_cache = cache(train_names, train=True, allow_stream=True)
        val_cache = cache(val_names, train=False, allow_stream=True)
        test_cache = cache(test_names, train=False)  # small: always in RAM

        manager = None
        if cfg.save_weights == "true":
            manager = CheckpointManager(dirs.checkpoints, max_to_keep=1)  # ref :420

        start_epoch = 0
        if cfg.resume:  # TPU extension: train-resume (the reference had none, SURVEY §5.3)
            src = CheckpointManager(latest_checkpoint_dir(cfg.resume))
            start_epoch = src.latest_epoch() or 0
            trainer.load_state(src.restore(trainer.state()))
            print(f"Resumed from {cfg.resume} at epoch {start_epoch}", flush=True)

        from gan_tpu.train.recovery import TrainingFault
        try:
            train_metrics, val_metrics = trainer.fit(
                train_cache, val_cache, test_cache, dirs.root,
                checkpoint_manager=manager, start_epoch=start_epoch)
        except TrainingFault as tf:
            # in-process rewind exhausted/impossible (recovery.py) — leave a
            # resume-ready directory and a nonzero exit for the supervisor
            print(f"\n{tf}", flush=True)
            print(f"Resume with the original flags plus: --resume {dirs.root}",
                  flush=True)
            raise SystemExit(17)

        # final test images (ref pix2pix.py:428-434)
        os.makedirs(dirs.final_test_imgs, exist_ok=True)
        from gan_tpu.data.augment import normalize_batch
        test_norm = np.asarray(normalize_batch(test_cache.astype(np.float32)))
        for i in range(test_norm.shape[0]):
            trainer.generate_image(test_norm[i:i + 1, 0], test_norm[i:i + 1, 1],
                                   os.path.join(dirs.final_test_imgs, f"img{i}.png"),
                                   key_index=i)   # index-keyed: resume-stable

        dump_json(train_metrics, os.path.join(dirs.logs, "train_metrics.json"))
        dump_json(val_metrics, os.path.join(dirs.logs, "val_metrics.json"))
        write_loss_figs(train_metrics, val_metrics, prefix="Pix2Pix ",
                        output_path=dirs.figs)               # ref pix2pix.py:443-454

    print("Done.")


if __name__ == "__main__":
    main(parse_pix2pix(sys.argv[1:]))
