"""Pair samplers: static shapes + pair conditions hold."""

import numpy as np

from srl_zoo_tpu.data import samplers


def test_same_action_pairs(rng):
    actions = np.array([0, 0, 1, 1, 1, 2])
    partners, mask = samplers.find_same_action_pairs(actions, rng)
    assert partners.shape == (6,) and mask.shape == (6,)
    for i in range(6):
        if mask[i]:
            assert actions[partners[i]] == actions[i]
            assert partners[i] != i
    assert mask[5] == 0.0  # action 2 has no partner


def test_dissimilar_pairs(rng):
    actions = np.array([0, 0, 0, 1])
    rewards = np.array([0, 1, 0, 0])
    partners, mask = samplers.find_dissimilar_pairs(actions, rewards, rng)
    for i in range(4):
        if mask[i]:
            assert actions[partners[i]] == actions[i]
            assert rewards[partners[i]] != rewards[i]
    assert mask[3] == 0.0  # lone action 1
    assert mask[0] == 1.0 and partners[0] == 1


def test_episode_prior_pairs(rng):
    ep = np.array([0, 0, 0, 1, 1, 2])
    partners, labels = samplers.episode_prior_pairs(ep, rng)
    for i in range(6):
        assert partners[i] != i
        assert labels[i] == float(ep[partners[i]] == ep[i])


def test_triplet_negatives(rng):
    ep_ids = np.repeat(np.arange(4), 25)  # 4 episodes of 25
    pool = np.arange(100)
    anchors = np.array([0, 30, 99])
    negs = samplers.triplet_negatives(anchors, ep_ids, pool, rng, min_gap=10)
    for a, n in zip(anchors, negs):
        assert ep_ids[n] != ep_ids[a] or abs(int(n) - int(a)) >= 10


def test_balanced_reward_indices(rng):
    indices = np.arange(100, dtype=np.int32)
    classes = np.zeros(100, np.int32)
    classes[:5] = 1  # rare class
    out = samplers.balanced_reward_indices(indices, classes, rng)
    assert len(out) == 100
    rare_frac = np.mean(classes[out] == 1)
    assert rare_frac > 0.3  # oversampled from 5% towards 50%
