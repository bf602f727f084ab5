"""Model-info surface (reference `info` / show_weights,
igtdetect.py:1567-1577): top-N feature weights per class.

Usage: python tools/info.py [model: reference|synthetic] [N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "reference"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    if which == "reference":
        from igtdetect_spark.config import REF_MODEL_PATH
        from igtdetect_spark.refmodel import load_reference_model

        model = load_reference_model(REF_MODEL_PATH)
    else:
        from igtdetect_spark.flagship import get_synthetic_model

        model = get_synthetic_model()

    from igtdetect_spark.training import top_weights

    print(f"model={which} classes={model.classes} "
          f"features={len(model.feature_names)} base={model.n_base}")
    print(f"{'class':<6}{'feature':<40}{'weight':>10}")
    for cls, feat, w in top_weights(model, n):
        print(f"{cls:<6}{feat:<40}{w:>10.4f}")


if __name__ == "__main__":
    main()
