"""One-time importer: vendor visual STL meshes -> packaged render assets.

The hand JSON assets (tools/import_hands.py) keep geoms' source mesh names
as provenance; physics collides fitted primitives, but camera observables
should show the real vendor meshes the reference renders (reference
models/hands/shadow_hand_e.py:24 loads the vendored MJCF whose visual
meshes dm_control renders).  This tool parses the vendor MJCF
<asset><mesh> declarations (honoring meshdir and per-mesh scale), copies
every STL referenced by a hand JSON's geom provenance into
dexterity_tpu/models/assets/meshes/<model>/, and writes
mesh_registry.json keyed '<model>/<mesh name>':

  {file, scale, visual_only, pos, quat}

`visual_only` is True when the mesh appears on a type-6 (visual) geom in
the JSON (Shadow/Adroit split visual vs collision meshes); False means
the vendor used one mesh as both collision and visual (MPL) — render
export re-emits those as extra visual-only geoms at the recorded pose.

The STL files are third-party Apache/BSD-licensed robot-model assets
(vendor/README.md), copied verbatim — they are data, not code.

Usage: python tools/import_meshes.py
"""

import json
import os
import shutil
import sys
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VENDOR = '/root/reference/dexterity/models/vendor'
SOURCES = {
    'adroit_hand': f'{VENDOR}/adroit/adroit_hand_description/mjcf/adroit_hand.xml',
    'shadow_hand_e': f'{VENDOR}/shadow_robot/shadow_hand_description/mjcf/shadow_hand_series_e.xml',
    'mpl_right': f'{VENDOR}/mpl/mpl_hand_description/mjcf/mpl_right.xml',
    'mpl_left': f'{VENDOR}/mpl/mpl_hand_description/mjcf/mpl_left.xml',
}
ASSETS = os.path.join(REPO, 'dexterity_tpu', 'models', 'assets')


def provenance_meshes(asset_json):
  """mesh name -> True if referenced by a visual (type-6) geom."""
  with open(asset_json) as f:
    d = json.load(f)
  names = {}

  def walk(b):
    for g in b.get('geoms', []):
      if g.get('mesh'):
        names[g['mesh']] = names.get(g['mesh'], False) or g.get('type') == 6
    for c in b.get('children', []):
      walk(c)

  walk(d['worldbody'])
  return names


def vendor_mesh_table(xml_path):
  """mesh name -> (absolute stl path, scale[3]) from a vendor MJCF."""
  tree = ET.parse(xml_path)
  root = tree.getroot()
  base = os.path.dirname(xml_path)
  meshdir = base
  comp = root.find('compiler')
  if comp is not None and comp.get('meshdir'):
    meshdir = os.path.normpath(os.path.join(base, comp.get('meshdir')))
  default_scale = [1.0, 1.0, 1.0]
  for dm in root.iter('default'):
    m = dm.find('mesh')
    if m is not None and m.get('scale'):
      default_scale = [float(v) for v in m.get('scale').split()]
  table = {}
  for asset in root.iter('asset'):
    for m in asset.findall('mesh'):
      name = m.get('name') or os.path.splitext(
          os.path.basename(m.get('file')))[0]
      scale = ([float(v) for v in m.get('scale').split()]
               if m.get('scale') else list(default_scale))
      table[name] = (os.path.join(meshdir, m.get('file')), scale)
  return table


def vendor_geom_poses(xml_path):
  """mesh name -> (pos[3], quat[4]) of the first geom using it."""
  root = ET.parse(xml_path).getroot()
  poses = {}
  for g in root.iter('geom'):
    if g.get('type') == 'mesh' and g.get('mesh') and g.get('mesh') not in poses:
      pos = [float(v) for v in (g.get('pos') or '0 0 0').split()]
      quat = [float(v) for v in (g.get('quat') or '1 0 0 0').split()]
      poses[g.get('mesh')] = (pos, quat)
  return poses


def main():
  registry = {}
  for model, xml_path in SOURCES.items():
    json_name = {'mpl_right': 'mpl_right', 'mpl_left': 'mpl_left'}.get(
        model, model)
    asset_json = os.path.join(ASSETS, f'{json_name}.json')
    if not os.path.exists(asset_json):
      print(f'skip {model}: no JSON asset')
      continue
    needed = provenance_meshes(asset_json)
    table = vendor_mesh_table(xml_path)
    poses = vendor_geom_poses(xml_path)
    outdir = os.path.join(ASSETS, 'meshes', model)
    os.makedirs(outdir, exist_ok=True)
    n = 0
    dual_use = model.startswith('mpl')   # MPL meshes are collision+visual
    for name, is_visual in sorted(needed.items()):
      if not (is_visual or dual_use):
        continue  # collision-only provenance (Shadow/Adroit decomposed)
      if name not in table:
        print(f'  {model}: mesh {name!r} not in vendor assets — skipped')
        continue
      src, scale = table[name]
      dst_rel = os.path.join('meshes', model, os.path.basename(src))
      shutil.copyfile(src, os.path.join(ASSETS, dst_rel))
      pos, quat = poses.get(name, ([0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]))
      registry[f'{model}/{name}'] = {
          'file': dst_rel, 'scale': scale,
          'emit_on_body': bool(dual_use and not is_visual),
          'pos': pos, 'quat': quat}
      n += 1
    print(f'{model}: {n} meshes imported')
  with open(os.path.join(ASSETS, 'mesh_registry.json'), 'w') as f:
    json.dump(registry, f, indent=1, sort_keys=True)
  print('wrote', os.path.join(ASSETS, 'mesh_registry.json'))


if __name__ == '__main__':
  main()
