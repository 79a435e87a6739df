#!/usr/bin/env python
"""find_clusters host-vs-device crossover at dense scale (VERDICT r4
item 7): times ``host_connected_components`` (cKDTree + union-find)
against the device label-propagation kernel on config-5-density frames,
at several candidate counts, and prints one JSON line per point — the
measurement behind ``find._DEVICE_MIN_FEATURES``.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from benchmarks.suite import enable_compile_cache
    enable_compile_cache()
    import jax

    from clustertracking_tpu.find import (_labels_device,
                                          host_connected_components)

    rng = np.random.default_rng(3)
    sep = (6.0, 6.0)
    ns = ([int(a) for a in sys.argv[1:]]
          or (1000, 2000, 4096, 8192, 16384, 32768, 65536))
    for n in ns:
        # config-5 density: ~10k features on 1024² → scale area with n
        side = 1024.0 * np.sqrt(n / 10000.0)
        coords = rng.uniform(8, side - 8, (n, 2)).astype(np.float32)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            lab_h = host_connected_components(coords, sep)
        host_s = (time.perf_counter() - t0) / reps
        _labels_device(coords, sep)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            lab_d = _labels_device(coords + 0.0, sep)
        dev_s = (time.perf_counter() - t0) / reps
        # parity (canonicalized grouping equality)
        from clustertracking_tpu.find import _canonicalize
        same = bool(
            (_canonicalize(np.asarray(lab_h))
             == _canonicalize(np.asarray(lab_d))).all()
        )
        print(json.dumps({
            "n": n, "host_ms": round(host_s * 1e3, 2),
            "device_ms": round(dev_s * 1e3, 2),
            "parity": same, "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
