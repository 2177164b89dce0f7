"""Export a compiled task as standalone MJCF XML
(reference: scripts/export_task.py:31-45 — export_with_assets_as_zip).

Run: python scripts/export_task.py --environment_name=reorient.state_dense \
        --out /tmp/reorient.xml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--environment_name', required=True)
  parser.add_argument('--out', required=True)
  parser.add_argument('--conformance', action='store_true',
                      help='emit explicit pair lists matching the compiled '
                           'candidate set (for solver cross-validation)')
  args = parser.parse_args()

  from dexterity_tpu import manipulation
  from dexterity_tpu.mjcf import export

  domain, task_name = args.environment_name.split('.')
  task = manipulation.build_task(domain, task_name)
  if args.conformance:
    xml = export.export_for_conformance(task.arena.spec)
  else:
    xml = export.export_mjcf(task.arena.spec)
  with open(args.out, 'w') as f:
    f.write(xml)
  print(f'wrote {args.out} ({len(xml)} bytes)')


if __name__ == '__main__':
  main()
