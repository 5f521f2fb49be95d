"""Grid-search runner: train over a dataset collection x override grid.

Capability equivalent of /root/reference/splat_trainer/scripts/
grid_search.py:21-32 (whose `grid_search` config + `test_datasets` are
missing from the reference checkout — this version takes them as CLI
arguments / a JSON sweep file).
"""

import argparse
import itertools
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("sweep", help="JSON: {datasets: [...], grid: {param: [values]}}")
    p.add_argument("--output", default="grid_search")
    p.add_argument("--base-config", default=None)
    args = p.parse_args(argv)

    from splat_trainer_tpu.config.loader import apply_overrides, load_config
    from splat_trainer_tpu.scripts.train import default_config_path, train_with_config

    with open(args.sweep) as f:
        sweep = json.load(f)

    grid = sweep.get("grid", {})
    keys = list(grid.keys())
    combos = list(itertools.product(*(grid[k] for k in keys))) or [()]

    results = {}
    for ds in sweep["datasets"]:
        for combo in combos:
            overrides = [f"{k}={v}" for k, v in zip(keys, combo)]
            name = "_".join([Path(ds).stem] + [str(v) for v in combo]) or "run"
            tree = load_config(args.base_config or default_config_path())
            tree = apply_overrides(tree, [f"dataset.base_path={ds}"] + overrides)
            run_path = Path(args.output).absolute() / name
            print(f"=== {name}: {overrides}")
            try:
                metrics = train_with_config(tree, run_path)
                results[name] = metrics
            except Exception as e:
                results[name] = {"error": str(e)}
                print(f"run {name} failed: {e}")

    out = Path(args.output).absolute() / "results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
