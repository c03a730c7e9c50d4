"""Single-scan demo (parity: reference tools/demo.py:23-112).

Feeds raw .bin/.npy point clouds through the full model + on-device NMS and
prints the detections (open3d/mayavi visualization is gated on
availability; this image has neither, so the default output is text)."""
from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


class DemoDataset:
    """Minimal raw-file dataset (parity: demo.py DemoDataset:23-60)."""

    def __init__(self, dataset_cfg, class_names, root_path, ext=".bin",
                 logger=None):
        from tsm_det_pointcloud_tpu.datasets.dataset import DatasetTemplate

        self._tmpl = DatasetTemplate(
            dataset_cfg=dataset_cfg, class_names=class_names, training=False,
            root_path=Path(root_path), logger=logger,
        )
        self.root_path = Path(root_path)
        self.ext = ext
        if self.root_path.is_dir():
            self.sample_file_list = sorted(
                glob.glob(str(self.root_path / f"*{ext}"))
            )
        else:
            self.sample_file_list = [str(root_path)]

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        f = self.sample_file_list[index]
        if self.ext == ".bin":
            points = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        elif self.ext == ".npy":
            points = np.load(f)
        else:
            raise NotImplementedError(self.ext)
        input_dict = {"points": points, "frame_id": index}
        return self._tmpl.prepare_data(data_dict=input_dict)

    def collate(self, data_dict):
        return self._tmpl.collate_batch([data_dict])

    @property
    def template(self):
        return self._tmpl


def main():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ext", type=str, default=".bin")
    args = parser.parse_args()

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.runtime.checkpoint import restore_checkpoint
    from tsm_det_pointcloud_tpu.utils import common_utils
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    import jax
    import jax.numpy as jnp

    cfg = EDict({"ROOT_DIR": Path(__file__).resolve().parent.parent,
                 "LOCAL_RANK": 0})
    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    logger.info("-----------------Demo of tsm_det_pointcloud_tpu-----------------")

    demo_dataset = DemoDataset(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        root_path=args.data_path, ext=args.ext, logger=logger,
    )
    logger.info("Total number of samples: \t%d", len(demo_dataset))

    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
        dataset=demo_dataset.template,
    )
    batch0 = demo_dataset.collate(demo_dataset[0])
    batch0 = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in batch0.items()}
    # jit the init: eager init is pathologically slow on remote backends
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False)
    )(jax.random.PRNGKey(0), dict(batch0))
    if args.ckpt:
        loaded = restore_checkpoint(args.ckpt)
        variables = dict(variables)
        for coll in ("params", "batch_stats", "statistics"):
            if coll in loaded and loaded[coll]:
                variables[coll] = loaded[coll]
        logger.info("Loaded checkpoint %s", args.ckpt)

    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(
            v, out, method=lambda m, bd: m.post_processing(bd)
        )
        return pred

    for idx in range(len(demo_dataset)):
        batch = demo_dataset.collate(demo_dataset[idx])
        batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                 for k, v in batch.items()}
        pred = jax.device_get(infer(variables, dict(batch)))
        cnt = int(pred["count"][0])
        logger.info("Sample %d: %d detections", idx, cnt)
        for i in range(cnt):
            b = pred["pred_boxes"][0][i]
            logger.info(
                "  label=%d score=%.3f box=[% .2f % .2f % .2f % .2f % .2f % .2f % .2f]",
                int(pred["pred_labels"][0][i]),
                float(pred["pred_scores"][0][i]), *[float(x) for x in b],
            )
    logger.info("Demo done.")


if __name__ == "__main__":
    main()
