"""Generate the reference-scale courtyard datasets on CPU (no TPU attach).

Builds both the static scene (scale drive, VERDICT r4 item 1) and the
moving-actor variant (robustness drill, item 6) so the TPU drives can
start immediately.  Run detached; raycasting ~1500 x 65k rays is
CPU-bound numpy.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "examples")
from run_loner import build_synthetic_dataset  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("static", "both"):
        build_synthetic_dataset(
            "./outputs/synthetic_dataset_courtyard", scene_name="courtyard"
        )
        print("static courtyard dataset done", flush=True)
    if which in ("actors", "both"):
        build_synthetic_dataset(
            "./outputs/synthetic_dataset_courtyard_actors",
            scene_name="courtyard_actors",
        )
        print("actor courtyard dataset done", flush=True)


if __name__ == "__main__":
    main()
