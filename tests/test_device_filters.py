"""Device batched filters agree bit-exactly with the host (cv2-exact) filters."""

import numpy as np

from atlaspatch_tpu.ops.filters import content_filter_mask_host
from atlaspatch_tpu.utils.image import is_black_patch, is_white_patch


def test_batched_filter_matches_host(rng):
    patches = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(16)]
    patches.append(np.zeros((32, 32, 3), np.uint8))
    patches.append(np.full((32, 32, 3), 250, np.uint8))
    batch = np.stack(patches)
    for rgb_t, sat_t in ((50, 15), (40, 5), (128, 50)):
        got = content_filter_mask_host(batch, rgb_thresh=rgb_t, sat_thresh=sat_t)
        want = np.array(
            [
                not is_black_patch(p, rgb_thresh=rgb_t)
                and not is_white_patch(p, sat_thresh=sat_t)
                for p in patches
            ]
        )
        np.testing.assert_array_equal(got, want)
