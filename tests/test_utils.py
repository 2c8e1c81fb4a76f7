"""Logging/viz utilities tests (reference console format, SURVEY.md §5)."""

import os

import numpy as np

from simt_tpu.utils import (
    MetricWriter,
    StepTimer,
    format_simt_line,
    format_warmup_line,
    plot_ntm,
)


def test_simt_line_matches_reference_format():
    m = dict(loss_seg_p=0.053, loss_seg_y=0.708, convex=-18.300, volume=-13.138,
             anchor=7.801, place=0.371)
    line = format_simt_line(0, 250000, m)
    # The exact format of trainV2_simt.py:439-441 / logs/SFDA_SimT.out:15.
    assert line == (
        "iter =        0/  250000, loss_seg_p = 0.053 loss_seg_y = 0.708 "
        "Convex = -18.300 Volume = -13.138 Anchor = 7.801 Place_loss = 0.371"
    )


def test_warmup_line_format():
    line = format_warmup_line(100, 250000, dict(loss_seg1=1.5, loss_seg2=2.25))
    assert line == "iter =      100/  250000, loss_seg1 = 1.500 loss_seg2 = 2.250"


def test_metric_writer_csv(tmp_path):
    path = str(tmp_path / "m.csv")
    w = MetricWriter(path)
    w.write(0, {"loss": 1.0})
    w.write(100, {"loss": 0.5})
    w.close()
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("step,time,loss")
    assert len(lines) == 3


def test_step_timer():
    t = StepTimer()
    t.tick(5)
    assert t.rate() > 0


def test_plot_ntm(tmp_path):
    path = plot_ntm(np.random.rand(6, 4), str(tmp_path / "ntm.png"), annotate=True)
    assert os.path.getsize(path) > 1000
