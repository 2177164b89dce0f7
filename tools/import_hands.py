"""One-time importer: reference vendor MJCF -> JSON model assets.

Parses the third-party hand descriptions (Shadow Hand E, Adroit, MPL L/R —
Apache/BSD-licensed robot models vendored by the reference), fits collision
primitives to mesh geoms, prunes unreachable contact pairs by sampling, and
writes the framework's canonical JSON specs to dexterity_tpu/models/assets/.

Run from the repo root:  python tools/import_hands.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from dexterity_tpu.core import serialization
from dexterity_tpu.mjcf.parser import load_mjcf
from dexterity_tpu.mjcf.prune import prune_spec_pairs

VENDOR = '/root/reference/dexterity/models/vendor'
ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      'dexterity_tpu', 'models', 'assets')

HANDS = {
    'adroit_hand': f'{VENDOR}/adroit/adroit_hand_description/mjcf/adroit_hand.xml',
    'shadow_hand_e': f'{VENDOR}/shadow_robot/shadow_hand_description/mjcf/shadow_hand_series_e.xml',
    'mpl_right': f'{VENDOR}/mpl/mpl_hand_description/mjcf/mpl_right.xml',
    'mpl_left': f'{VENDOR}/mpl/mpl_hand_description/mjcf/mpl_left.xml',
}


def main():
  os.makedirs(ASSETS, exist_ok=True)
  for name, path in HANDS.items():
    print(f'== importing {name}')
    spec = load_mjcf(path)
    spec.name = name
    spec = prune_spec_pairs(spec, num_samples=256, verbose=True)
    out = os.path.join(ASSETS, f'{name}.json')
    serialization.save_spec(spec, out)
    # Round-trip check.
    spec2 = serialization.load_spec(out)
    m1, m2 = spec.compile(), spec2.compile()
    assert m1.nq == m2.nq and m1.npair == m2.npair and m1.nu == m2.nu
    import numpy as np
    np.testing.assert_allclose(np.asarray(m1.body_pos), np.asarray(m2.body_pos))
    np.testing.assert_allclose(np.asarray(m1.geom_size), np.asarray(m2.geom_size))
    print(f'   saved {out} ({os.path.getsize(out)//1024} KiB), '
          f'npair={m1.npair}')


if __name__ == '__main__':
  main()
