"""data.utils + core.mesh unit tests."""
import numpy as np
import pytest

from auformer.core.mesh import make_mesh, parse_mesh_shape
from auformer.data.utils import (ex_from_one_hot, get_label_str2,
                                 get_position, split_EX_VA_AU)


def test_split_columns():
    x = np.arange(2 * 21).reshape(2, 21)
    ex, va, au = split_EX_VA_AU(x)
    assert ex.shape == (2, 7) and va.shape == (2, 2) and au.shape == (2, 12)
    np.testing.assert_array_equal(np.hstack([ex, va, au]), x)


def test_ex_from_one_hot():
    oh = np.eye(7)[[3, 0, 6]]
    np.testing.assert_array_equal(ex_from_one_hot(oh), [3, 0, 6])


def test_get_position():
    assert get_position("v_main") == "_main"
    assert get_position("v_left") == "_left"
    assert get_position("v_right") == "_right"
    assert get_position("v") == ""


def test_get_label_str2():
    data = {"AU": {"original_split": "train"},
            "EX": {"original_split": "val"},
            "VA": {"original_split": "test"}}
    assert get_label_str2(data) == "_AU1__EX1v_VA1t"


def test_parse_mesh_shape():
    assert parse_mesh_shape("data:-1", 8) == {"data": 8}
    assert parse_mesh_shape("data:4,model:2", 8) == {"data": 4, "model": 2}
    assert parse_mesh_shape("model:2,data:-1", 8) == {"model": 2, "data": 4}
    with pytest.raises(ValueError):
        parse_mesh_shape("model:3,data:-1", 8)  # 8 not divisible by 3
    with pytest.raises(ValueError):
        parse_mesh_shape("data:-1,model:-1", 8)  # two fill axes


def test_make_mesh_axes():
    m = make_mesh("data:4,model:2")
    assert m.shape == {"data": 4, "model": 2}
