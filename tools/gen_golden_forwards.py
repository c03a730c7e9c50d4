"""Regenerate the module-level golden forwards (tests/goldens/*.npz).

Run ON THE CPU BACKEND (the suite's backend) and ONLY when an intentional
numeric change lands — the accompanying commit must say the goldens were
regenerated and why. See tests/test_golden_forwards.py.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tests.golden_forwards_common import ALL_CASES

    out_dir = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    out_dir.mkdir(exist_ok=True)
    for case in ALL_CASES:
        name, outputs = case()
        path = out_dir / f"{name}_forward.npz"
        np.savez_compressed(path, **outputs)
        sizes = {k: list(v.shape) for k, v in outputs.items()}
        print(f"wrote {path} {sizes}")


if __name__ == "__main__":
    main()
