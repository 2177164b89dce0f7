"""Generates tutorial.ipynb from TUTORIAL.md (reference ships a notebook;
markdown prose becomes markdown cells, ```python fences become code cells).

Usage: python tools/make_tutorial_nb.py
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
  src = open(os.path.join(REPO, 'TUTORIAL.md')).read()
  cells = []
  parts = re.split(r'```python\n(.*?)```\n?', src, flags=re.S)
  for i, part in enumerate(parts):
    part = part.strip('\n')
    if not part.strip():
      continue
    if i % 2 == 0:
      cells.append({'cell_type': 'markdown', 'metadata': {},
                    'source': part.splitlines(keepends=True)})
    else:
      cells.append({'cell_type': 'code', 'metadata': {},
                    'execution_count': None, 'outputs': [],
                    'source': part.splitlines(keepends=True)})
  nb = {
      'nbformat': 4, 'nbformat_minor': 5,
      'metadata': {
          'kernelspec': {'display_name': 'Python 3', 'language': 'python',
                         'name': 'python3'},
          'language_info': {'name': 'python', 'version': '3.10'},
      },
      'cells': cells,
  }
  out = os.path.join(REPO, 'tutorial.ipynb')
  with open(out, 'w') as f:
    json.dump(nb, f, indent=1)
    f.write('\n')
  print(f'wrote {out} ({len(cells)} cells)')


if __name__ == '__main__':
  main()
