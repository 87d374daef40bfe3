"""VOC07 mAP operator (A9): greedy-matching semantics on adversarial
multi-overlap geometry (the case q105's one-overlap oracle cannot cover),
plus hand-computed 11-point AP values."""

import pytest

from conftest import SF_DIR
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.map_metric import (
    voc07_average_precision,
    voc07_map,
    voc_greedy_match,
)

DET_COLS = "image_id bigint, class_id int, det_id bigint, conf double, x1 double, y1 double, x2 double, y2 double"
GT_COLS = "image_id bigint, class_id int, gt_id bigint, x1 double, y1 double, x2 double, y2 double"


@pytest.fixture
def fixture(spark):
    # image 1 / class 0: two OVERLAPPING GT boxes — argmax + claim rules
    # matter. image 2: GT with no detections (missed). image 3: detection
    # with no GT (empty cogroup side). image 4 / class 1: confidence tie.
    gts = spark.createDataFrame(
        [
            (1, 0, 1, 0.0, 0.0, 10.0, 10.0),   # GT1
            (1, 0, 2, 8.0, 0.0, 18.0, 10.0),   # GT2 overlaps GT1
            (2, 0, 3, 0.0, 0.0, 10.0, 10.0),   # GT3 never detected
            (4, 1, 4, 0.0, 0.0, 10.0, 10.0),   # GT4, tie class
        ],
        schema=GT_COLS,
    )
    dets = spark.createDataFrame(
        [
            # A: argmax GT1 (IoU .818 vs .176) -> TP, claims GT1
            (1, 0, 1, 0.9, 1.0, 0.0, 11.0, 10.0),
            # B: IoU(GT1) = 1.0 but GT1 claimed; NO fallback to GT2 -> FP
            (1, 0, 2, 0.8, 0.0, 0.0, 10.0, 10.0),
            # C: argmax GT2 (.818), unclaimed -> TP
            (1, 0, 3, 0.7, 8.0, 1.0, 18.0, 11.0),
            # D: argmax GT2 (.818) claimed -> FP
            (1, 0, 4, 0.6, 7.0, 0.0, 17.0, 10.0),
            # E: image without any GT -> FP
            (3, 0, 5, 0.5, 0.0, 0.0, 10.0, 10.0),
            # F/G: same confidence on GT4 -> det_id asc wins the claim
            (4, 1, 10, 0.4, 0.0, 0.0, 10.0, 10.0),
            (4, 1, 11, 0.4, 1.0, 0.0, 11.0, 10.0),
        ],
        schema=DET_COLS,
    )
    return dets, gts


def test_greedy_match_argmax_claim_no_fallback(spark, fixture):
    dets, gts = fixture
    got = {
        r.det_id: r.tp
        for r in voc_greedy_match(dets, gts, iou_thresh=0.5).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1, 4: 0, 5: 0, 10: 1, 11: 0}


def test_voc07_ap_hand_computed(spark, fixture):
    dets, gts = fixture
    matched = voc_greedy_match(dets, gts, iou_thresh=0.5)
    ap = {
        r.class_id: (r.n_pos, r.n_det, r.ap)
        for r in voc07_average_precision(matched, gts).collect()
    }
    # class 0: npos=3, dets (conf desc) tp=[1,0,1,0,0] ->
    #   prec 1, 1/2, 2/3, 1/2, 2/5 at rec 1/3,1/3,2/3,2/3,2/3
    #   11-pt: r<=0.3 -> max prec 1.0 (4 pts); 0.4..0.6 -> 2/3 (3 pts);
    #   0.7..1.0 unreachable -> 0 (4 pts). AP = (4 + 2)/11 = 6/11.
    n_pos, n_det, ap0 = ap[0]
    assert (n_pos, n_det) == (3, 5)
    assert ap0 == pytest.approx(6.0 / 11.0, abs=1e-12)
    # class 1: tie broken by det_id -> first det TP, rec hits 1.0 with
    # prec 1.0, so every grid point takes max prec 1.0. AP = 1.0.
    n_pos, n_det, ap1 = ap[1]
    assert (n_pos, n_det) == (1, 2)
    assert ap1 == pytest.approx(1.0, abs=1e-12)

    m = voc07_map(voc07_average_precision(matched, gts)).first().map
    assert m == pytest.approx((6.0 / 11.0 + 1.0) / 2, abs=1e-12)


def test_threshold_parameter_reaches_workers(spark, fixture):
    """iou_thresh travels by closure (workers re-import the module): at
    thresh=0.9 only the exact-overlap detection stays TP-eligible, and it
    is det B — det A claims nothing because its best IoU (.818) < .9."""
    dets, gts = fixture
    got = {
        r.det_id: r.tp
        for r in voc_greedy_match(dets, gts, iou_thresh=0.9).collect()
    }
    assert got[1] == 0 and got[2] == 1  # B's IoU(GT1)=1.0 >= .9, unclaimed
    assert got[3] == 0 and got[4] == 0 and got[5] == 0


def test_declarative_matcher_agrees_with_cogroup(spark):
    """Tier agreement (the q184 pattern): the declarative grid-bucketed
    matcher must reproduce the cogroup greedy walk's tp flags exactly on
    the q105 fixture at SF_DIR (tie-free IoU geometry, so both tie
    rules coincide)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.map_metric import (
        voc_greedy_match,
        voc_match_declarative,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.evaluation import (
        _map_fixture,
    )

    dets, gt = _map_fixture(spark, SF_DIR)
    a = {
        (r.image_id, r.class_id, r.det_id): r.tp
        for r in voc_greedy_match(dets, gt, iou_thresh=0.5).collect()
    }
    b = {
        (r.image_id, r.class_id, r.det_id): r.tp
        for r in voc_match_declarative(
            dets, gt, iou_thresh=0.5, gt_id_col="cell", cell_size=512.0
        ).collect()
    }
    assert a == b and len(a) == dets.count()
