#!/usr/bin/env python3
"""CycleGAN CLI — public surface parity with the reference's cycle_gan.py
(:379-502): same flags (--input-images / --target-images, --lambda default
10), same modes and output contract, checkpoints tracking all 4 networks + 4
optimizer states with max_to_keep=3 (cycle_gan.py:437-461).
"""

from __future__ import annotations

import os
import sys

from gan_tpu.config import CycleGANConfig, parse_cyclegan
from gan_tpu.data.pipeline import build_cyclegan_cache
from gan_tpu.data.split import cyclegan_split, list_images
from gan_tpu.train.checkpoint import CheckpointManager, latest_checkpoint_dir
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
from gan_tpu.utils import dump_json, make_run_dirs, redirect_logging, write_loss_figs


def main(cfg: CycleGANConfig) -> None:
    os.environ["GAN_TPU_PALLAS"] = cfg.use_pallas            # kernel-path gate
    if os.environ.get("GAN_TPU_MULTIHOST") == "1":           # pod-scale DP opt-in
        from gan_tpu.parallel.mesh import init_multihost
        init_multihost()
    dirs = make_run_dirs(cfg.output)                         # ref cycle_gan.py:421-431
    if cfg.logging == "true":
        redirect_logging(dirs)

    trainer = CycleGANTrainer(cfg)
    cfg.dump(os.path.join(dirs.logs, "config.json"))         # ref cycle_gan.py:447-448

    print("\nReading in and processing images.\n", flush=True)
    contents_x = list_images(cfg.input_images)
    assert contents_x, "No images found in input image directory!"  # ref :99

    from gan_tpu.data.augment import JITTER_PAD
    from gan_tpu.data.loader import FileCache, host_cache_fits
    import numpy as np

    def cache(directory, names, train, allow_stream=False):
        """Decoded uint8 host cache, or a FileCache streaming from disk when
        the decoded corpus exceeds host RAM / --host-cache off."""
        paths = [os.path.join(directory, n) for n in names]
        size = cfg.img_size + (JITTER_PAD if train else 0)
        sample_shape = (size, size, cfg.n_channels)
        est = len(paths) * int(np.prod(sample_shape))
        if allow_stream and not host_cache_fits(est, cfg.host_cache):
            print(f"Host cache disabled for {len(paths)} files — streaming "
                  "from disk.", flush=True)
            return FileCache(
                paths,
                lambda p: build_cyclegan_cache(
                    [p], img_size=cfg.img_size, channels=cfg.n_channels,
                    train=train)[0],
                sample_shape, cfg.batch_size)
        return build_cyclegan_cache(paths, img_size=cfg.img_size,
                                    channels=cfg.n_channels, train=train)

    if cfg.predict:                                           # ref cycle_gan.py:450-453
        predict_cache = cache(cfg.input_images, contents_x, train=False,
                              allow_stream=True)
        mgr = CheckpointManager(latest_checkpoint_dir(cfg.weights))
        trainer.load_state(mgr.restore(trainer.state()))
        trainer.predict(predict_cache, dirs.root,
                        raw=cfg.raw_predictions == "true", raw_names=contents_x)

    if cfg.train:                                             # ref cycle_gan.py:455-495
        contents_y = list_images(cfg.target_images)
        assert contents_y, "No images found in target image directory!"  # ref :112
        train_x_n, train_y_n, val_x_n, val_y_n, test_n = cyclegan_split(
            contents_x, contents_y, seed=cfg.seed, test_img=cfg.test_img,
            validation_size=cfg.validation_size)
        train_x = cache(cfg.input_images, train_x_n, train=True, allow_stream=True)
        train_y = cache(cfg.target_images, train_y_n, train=True, allow_stream=True)
        val_x = cache(cfg.input_images, val_x_n, train=False, allow_stream=True)
        val_y = cache(cfg.target_images, val_y_n, train=False, allow_stream=True)
        test_cache = cache(cfg.input_images, test_n, train=False)  # small

        manager = None
        if cfg.save_weights == "true":
            manager = CheckpointManager(dirs.checkpoints, max_to_keep=3)  # ref :461

        start_epoch = 0
        if cfg.resume:  # TPU extension: train-resume
            src = CheckpointManager(latest_checkpoint_dir(cfg.resume))
            start_epoch = src.latest_epoch() or 0
            trainer.load_state(src.restore(trainer.state()))
            print(f"Resumed from {cfg.resume} at epoch {start_epoch}", flush=True)

        from gan_tpu.train.recovery import TrainingFault
        try:
            train_metrics, val_metrics = trainer.fit(
                train_x, train_y, val_x, val_y, test_cache, dirs.root,
                checkpoint_manager=manager, start_epoch=start_epoch)
        except TrainingFault as tf:
            # in-process rewind exhausted/impossible (recovery.py) — leave a
            # resume-ready directory and a nonzero exit for the supervisor
            print(f"\n{tf}", flush=True)
            print(f"Resume with the original flags plus: --resume {dirs.root}",
                  flush=True)
            raise SystemExit(17)

        # final test images (ref cycle_gan.py:469-475)
        os.makedirs(dirs.final_test_imgs, exist_ok=True)
        from gan_tpu.data.augment import normalize_batch
        test_norm = np.asarray(normalize_batch(test_cache.astype(np.float32)))
        for i in range(test_norm.shape[0]):
            trainer.generate_image(test_norm[i:i + 1],
                                   os.path.join(dirs.final_test_imgs, f"img{i}.png"),
                                   key_index=i)   # index-keyed: resume-stable

        dump_json(train_metrics, os.path.join(dirs.logs, "train_metrics.json"))
        dump_json(val_metrics, os.path.join(dirs.logs, "val_metrics.json"))
        write_loss_figs(train_metrics, val_metrics, prefix="CycleGAN ",
                        output_path=dirs.figs)                # ref cycle_gan.py:484-495

    print("Done.")


if __name__ == "__main__":
    main(parse_cyclegan(sys.argv[1:]))
