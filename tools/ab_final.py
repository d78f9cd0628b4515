"""Decision A/B with AB_RESULTS.json output (the winner feeds bench.py).

    python tools/ab_final.py [frames] [combo ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import ab_flags

    results = ab_flags.main() or {}
    out = {name: {"fps": res["fps"], "env": ab_flags.COMBOS[name]}
           for name, res in results.items()}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_RESULTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("ab results ->", path, flush=True)


if __name__ == "__main__":
    main()
