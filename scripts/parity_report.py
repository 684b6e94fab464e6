"""Generate the reference-binary parity report (PARITY.md numbers).

Runs the same harness as tests/test_parity_reference.py at 1000 randomized
cases against the compiled reference oracle (tests/parity/build_oracle.sh)
and prints a markdown table of worst-case deviations per output.

Usage: python scripts/parity_report.py [num_cases]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

from tests.test_parity_reference import run_parity_cases  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    worst = run_parity_cases(n, seed=2024)
    print(f"Parity vs reference binary over {n} randomized consistent "
          "minimal sets (f64):\n")
    print("| output | max abs deviation | notes |")
    print("|---|---|---|")
    print(f"| α (getAlpha) | {worst['alpha']:.3e} | bit-exact arithmetic |")
    print(f"| α̃ (getAlphaK) | {worst['alpha_k']:.3e} | bit-exact "
          "arithmetic |")
    print(f"| v (calculateVelocities) | {worst['v']:.3e} | sign-aligned; "
          "|v|=1 scale |")
    print(f"| w (calculateVelocities) | {worst['w']:.3e} | |")
    print(f"| k (acceleration) | {worst['k']:.3e} | rel err, "
          "compat_negate_k=True |")


if __name__ == "__main__":
    main()
