"""Hand model tests (reference: models/hands/hands_test.py)."""

import numpy as np
import pytest

from dexterity_tpu.models import hands


@pytest.fixture(scope='module')
def all_hands():
  return {
      'adroit': hands.AdroitHand(),
      'shadow': hands.ShadowHandSeriesE(),
      'mpl_right': hands.MPLHand(side=hands.HandSide.RIGHT),
      'mpl_left': hands.MPLHand(side=hands.HandSide.LEFT, name='mpl_l'),
  }


def test_counts(all_hands):
  assert all_hands['adroit'].num_joints == 24
  assert all_hands['adroit'].num_actuators == 24
  assert not all_hands['adroit'].underactuated
  assert all_hands['shadow'].num_joints == 24
  assert all_hands['shadow'].num_actuators == 20
  assert all_hands['shadow'].underactuated
  assert all_hands['mpl_right'].num_joints == 22
  assert all_hands['mpl_right'].num_actuators == 13


def test_projection_matrices_are_pseudo_inverse_pairs(all_hands):
  """position_to_control @ control_to_position == I
  (reference: hands_test.py:26-31)."""
  for name, hand in all_hands.items():
    p2c = hand.position_to_control
    c2p = hand.control_to_position
    np.testing.assert_allclose(p2c @ c2p, np.eye(hand.num_actuators),
                               atol=1e-9, err_msg=name)


def test_control_round_trip(all_hands):
  """ctrl -> qpos -> ctrl round-trips for coupled hands."""
  for name, hand in all_hands.items():
    rng = np.random.RandomState(0)
    ctrl = rng.uniform(-0.5, 0.5, hand.num_actuators)
    qpos = hand.control_to_joint_positions(ctrl)
    back = hand.joint_positions_to_control(qpos)
    np.testing.assert_allclose(back, ctrl, atol=1e-9, err_msg=name)


def test_shadow_coupled_joints(all_hands):
  coupled = all_hands['shadow'].coupled_joint_names
  assert len(coupled) == 4  # FF, MF, RF, LF J0/J1 pairs
  for pair in coupled:
    assert len(pair) == 2


def test_fingertip_sites_exist(all_hands):
  for name, hand in all_hands.items():
    model = hand.spec.compile()
    for site in hand.fingertip_site_names:
      assert site in model.site_names, (name, site)


def test_compile_and_step(all_hands):
  """Every hand compiles and steps (reference: hands_test.py:52-57)."""
  import jax
  import jax.numpy as jnp
  from dexterity_tpu.core import types as T
  from dexterity_tpu.physics import step as physics_step
  hand = all_hands['adroit']
  model = hand.spec.compile()
  data = T.make_data(model)
  data = jax.jit(lambda d: physics_step.step(model, d))(data)
  assert np.all(np.isfinite(np.asarray(data.qpos)))


def test_sample_joint_angles_within_limits(all_hands):
  """sample_joint_angles stays inside range_fraction * limits and couples
  tendon-driven joints (reference: dexterous_hand.py:120-142,
  hands_test.py sampling tests)."""
  import jax
  for name, hand in all_hands.items():
    ranges = hand.joint_ranges
    for frac in (1.0, 0.5):
      qpos = np.asarray(hand.sample_joint_angles(jax.random.PRNGKey(0),
                                                 range_fraction=frac))
      lo, hi = (ranges * frac).T
      assert np.all(qpos >= lo - 1e-9), name
      assert np.all(qpos <= hi + 1e-9), name
      for ids in hand.coupled_joint_ids:
        vals = qpos[np.asarray(ids)]
        np.testing.assert_allclose(vals, vals[0], err_msg=name)


def test_sample_joint_angles_rejects_bad_fraction(all_hands):
  import jax
  hand = all_hands['adroit']
  import pytest
  with pytest.raises(ValueError):
    hand.sample_joint_angles(jax.random.PRNGKey(0), range_fraction=1.5)


def test_sample_collision_free_joint_angles(all_hands):
  """Sampled configurations are genuinely self-collision-free
  (reference: hands_test.py:100-110, 50x there; 5x here for CI time)."""
  import jax
  from dexterity_tpu.core import types as T
  from dexterity_tpu.models.binding import HandBinding
  from dexterity_tpu.physics import step as physics_step
  from dexterity_tpu.utils import collisions

  hand = all_hands['adroit']
  model = hand.spec.compile()
  binding = HandBinding(hand, '').resolve(model)
  data = T.make_data(model)
  self_mask = collisions.self_mask(model, '')

  @jax.jit
  def sample(key):
    return hand.sample_collision_free_joint_angles(
        model, data, binding, key, range_fraction=0.5)

  for seed in range(5):
    qpos, ok = sample(jax.random.PRNGKey(seed))
    assert bool(ok), seed
    d = data.replace(qpos=data.qpos.at[np.asarray(binding.qpos_adr)].set(qpos))
    d = jax.jit(lambda dd: physics_step.fwd_position(model, dd))(d)
    assert not bool(collisions.has_collision(d, self_mask)), seed
