"""Bounded TPU-tunnel health probe: exit 0 if a real device matmul completes
within --timeout seconds, 3 otherwise.

The session's tunneled backend can wedge such that backend init (and even
`jax.devices()`) succeeds but any dispatch hangs forever (CLAUDE.md). Long
jobs should gate on this before committing to a multi-minute compile.
Run as: python scripts/tpu_health.py [--timeout 60]
"""

import argparse
import os
import sys
import threading


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=60)
    args = ap.parse_args()

    def watch():
        print(f"tpu_health: no device result within {args.timeout}s — tunnel wedged",
              file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(args.timeout, watch)
    t.daemon = True
    t.start()

    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)
    v = float((x @ x).ravel()[0])  # host transfer = the only reliable sync
    t.cancel()
    print(f"tpu_health: ok ({jax.devices()[0]}, probe={v})")


if __name__ == "__main__":
    main()
