"""On-disk feature cache with parameter-change invalidation.

TPU-native counterpart of reference src/base2d/feature_cache.{h,cc}: the
reference writes `<name>-keypoints.bin` / `-descriptors.bin` raw dumps plus
a `-params.ini` that auto-invalidates the cache whenever any detection
option changes (feature_cache.cc:53-110,126-162) and a `-metadata.ini` with
image dims. Here: one `<name>.npz` per image holding keypoints/descriptors/
dims, and a JSON params fingerprint checked on every query; extract-on-miss
via a pluggable detector callback.
"""

import hashlib
import json
import os

import numpy as np

from .provider import Features


class FeatureCache:
    def __init__(self, cache_path, params: dict, detector=None, capacity=4096):
        """detector: callable(image_idx) -> (keypoints (N,2), descriptors (N,D)).

        `params` is the full detection-parameter dict; any change invalidates
        previously cached entries (matching reference semantics).
        """
        self.cache_path = cache_path
        self.detector = detector
        self.capacity = capacity
        os.makedirs(cache_path, exist_ok=True)
        blob = json.dumps(params, sort_keys=True).encode()
        self.fingerprint = hashlib.sha256(blob).hexdigest()[:16]
        self._dims_cache = {}

    def _file(self, name):
        return os.path.join(self.cache_path, f"{name}.npz")

    def query(self, image_idx, name):
        """Features for image `name` — read-on-hit, extract-on-miss."""
        path = self._file(name)
        if os.path.exists(path):
            with np.load(path) as data:
                if str(data.get("fingerprint")) == self.fingerprint:
                    return Features.from_arrays(
                        data["keypoints"], data["descriptors"], self.capacity
                    )
        if self.detector is None:
            raise FileNotFoundError(
                f"no cached features for {name} and no detector configured"
            )
        out = self.detector(image_idx)
        kp, desc = out[0], out[1]
        dims = out[2] if len(out) > 2 else (0, 0)
        np.savez(
            path,
            keypoints=np.asarray(kp, np.float32),
            descriptors=np.asarray(desc, np.float32),
            dims=np.asarray(dims, np.int32),
            fingerprint=self.fingerprint,
        )
        return Features.from_arrays(kp, desc, self.capacity)

    def query_dimensions(self, image_idx, name):
        """(rows, cols, diagonal) of an image WITHOUT decoding it —
        reference FeatureCache::query_dimensions
        (feature_cache.cc:168-195,222-243): dims are persisted alongside
        the features at extraction time. Returns (0, 0, 0.0) when unknown
        (pre-dims cache entries or array providers)."""
        if name in self._dims_cache:
            return self._dims_cache[name]
        path = self._file(name)
        if not os.path.exists(path):
            self.query(image_idx, name)
        with np.load(path) as data:
            if "dims" not in data:
                out = (0, 0, 0.0)
            else:
                rows, cols = (int(v) for v in data["dims"])
                out = (rows, cols, float(np.hypot(rows, cols)))
        self._dims_cache[name] = out
        return out

    def clear(self):
        for f in os.listdir(self.cache_path):
            if f.endswith(".npz"):
                os.remove(os.path.join(self.cache_path, f))
