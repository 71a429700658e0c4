"""Test-only LITERAL numpy port of pycocotools ``COCOeval`` matching and
accumulation semantics (VERDICT round-2 item 2).

The reference's AP numbers ARE pycocotools
(/root/reference/yolov7/evaluation/coco_evaluation.py:79 delegates to d2's
COCOEvaluator, which wraps pycocotools.COCOeval). pycocotools is not
installed in this container, so this file transcribes the exact
`evaluateImg` / `accumulate` / `summarize` control flow from the public
pycocotools source (cocoeval.py) so the clean-room evaluator in
yolov7_d2_tpu/evaluation/coco_eval.py can be differential-tested against
the true semantics: crowd re-matching, ignore propagation, the
"break on first ignored gt once a real match is held" rule, stable
mergesort score ordering, per-class npig==0 exclusion (-1 precision), and
the 101-point searchsorted interpolation.

This is TEST INFRASTRUCTURE: nothing here ships in the framework, and the
framework's evaluator (written first, clean-room) must NOT import it.
"""

from __future__ import annotations

import numpy as np


KPT_OKS_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89,
]) / 10.0


class Params:
    def __init__(self, iouType="bbox"):
        self.iouThrs = np.linspace(
            0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        self.recThrs = np.linspace(
            0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True)
        if iouType == "keypoints":
            # pycocotools setKpParams
            self.maxDets = [20]
            self.areaRng = [
                [0, 1e5 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2],
            ]
            self.areaRngLbl = ["all", "medium", "large"]
            self.kpt_oks_sigmas = KPT_OKS_SIGMAS
        else:
            self.maxDets = [100]
            self.areaRng = [
                [0, 1e5 ** 2], [0, 32 ** 2], [32 ** 2, 96 ** 2],
                [96 ** 2, 1e5 ** 2],
            ]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        self.iouType = iouType
        self.useCats = 1


def _iou_bbox(d, g, iscrowd):
    """maskUtils.iou for xywh boxes (pycocotools _mask.pyx bbIou)."""
    ious = np.zeros((len(d), len(g)))
    for j, gt in enumerate(g):
        ga = gt[2] * gt[3]
        for i, dt in enumerate(d):
            w = min(dt[0] + dt[2], gt[0] + gt[2]) - max(dt[0], gt[0])
            h = min(dt[1] + dt[3], gt[1] + gt[3]) - max(dt[1], gt[1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            da = dt[2] * dt[3]
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / union
    return ious


def _iou_segm(d, g, iscrowd):
    ious = np.zeros((len(d), len(g)))
    for j, gm in enumerate(g):
        ga = float(np.count_nonzero(gm))
        for i, dm in enumerate(d):
            inter = float(np.count_nonzero(np.logical_and(dm, gm)))
            da = float(np.count_nonzero(dm))
            union = da if iscrowd[j] else da + ga - inter
            if union > 0:
                ious[i, j] = inter / union
    return ious


class COCOevalOracle:
    """Mirror of pycocotools.COCOeval for in-memory annotations.

    gts: list of dicts {id, image_id, category_id, bbox(xywh), area,
         iscrowd, ignore?, segmentation(binary mask)?}
    dts: list of dicts {id, image_id, category_id, bbox(xywh), score,
         area?, segmentation?}
    """

    def __init__(self, gts, dts, img_ids, cat_ids, iouType="bbox"):
        self.params = Params(iouType)
        self.params.imgIds = list(img_ids)
        self.params.catIds = list(cat_ids)
        self._gts = {}
        self._dts = {}
        for img in img_ids:
            for cat in cat_ids:
                self._gts[img, cat] = [
                    dict(g) for g in gts
                    if g["image_id"] == img and g["category_id"] == cat
                ]
                self._dts[img, cat] = [
                    dict(d) for d in dts
                    if d["image_id"] == img and d["category_id"] == cat
                ]
        # _prepare: gt['ignore'] = gt['ignore'] or iscrowd
        for anns in self._gts.values():
            for gt in anns:
                gt["ignore"] = gt.get("ignore", 0) or gt.get("iscrowd", 0)
        # loadRes semantics: det area = bbox w*h (bbox) / mask area (segm)
        # / keypoint-extent box area (keypoints, cocoeval loadRes:
        # x0,x1,y0,y1 from kp extremes, area=(x1-x0)*(y1-y0))
        for anns in self._dts.values():
            for dt in anns:
                if "area" not in dt:
                    if self.params.iouType == "segm":
                        dt["area"] = float(
                            np.count_nonzero(dt["segmentation"]))
                    elif self.params.iouType == "keypoints":
                        kp = np.asarray(dt["keypoints"], np.float64)
                        x = kp[0::3]
                        y = kp[1::3]
                        x0, x1 = x.min(), x.max()
                        y0, y1 = y.min(), y.max()
                        dt["area"] = (x1 - x0) * (y1 - y0)
                        dt["bbox"] = [x0, y0, x1 - x0, y1 - y0]
                    else:
                        dt["area"] = dt["bbox"][2] * dt["bbox"][3]

    # -- computeIoU (dt sorted by -score, truncated to maxDets[-1]) --------
    def computeIoU(self, imgId, catId):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[0: p.maxDets[-1]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        if p.iouType == "segm":
            return _iou_segm([d["segmentation"] for d in dt],
                             [g["segmentation"] for g in gt], iscrowd)
        if p.iouType == "keypoints":
            return self.computeOks(dt, gt)
        return _iou_bbox([d["bbox"] for d in dt],
                         [g["bbox"] for g in gt], iscrowd)

    # -- computeOks (literal transcription of cocoeval.computeOks) ---------
    def computeOks(self, dts, gts):
        sigmas = self.params.kpt_oks_sigmas
        vars = (sigmas * 2) ** 2
        k = len(sigmas)
        ious = np.zeros((len(dts), len(gts)))
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"], np.float64)
            xg = g[0::3]
            yg = g[1::3]
            vg = g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0 = bb[0] - bb[2]
            x1 = bb[0] + bb[2] * 2
            y0 = bb[1] - bb[3]
            y1 = bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"], np.float64)
                xd = d[0::3]
                yd = d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros((k,))
                    dx = (np.max((z, x0 - xd), axis=0)
                          + np.max((z, xd - x1), axis=0))
                    dy = (np.max((z, y0 - yd), axis=0)
                          + np.max((z, yd - y1), axis=0))
                e = ((dx ** 2 + dy ** 2) / vars
                     / (gt["area"] + np.spacing(1)) / 2)
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # -- evaluateImg (literal transcription) -------------------------------
    def evaluateImg(self, imgId, catId, aRng, maxDet, ious):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < aRng[0] or g["area"] > aRng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = (ious[:, gtind] if len(ious) > 0 else ious)

        T = len(self.params.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(self.params.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(
            dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # -- evaluate + accumulate (literal transcription) ---------------------
    def evaluate_accumulate(self):
        p = self.params
        catIds = p.catIds
        ious = {
            (imgId, catId): self.computeIoU(imgId, catId)
            for imgId in p.imgIds for catId in catIds
        }
        maxDet = p.maxDets[-1]
        evalImgs = {
            (c, a, i): self.evaluateImg(i, c, aRng, maxDet, ious[i, c])
            for c in catIds
            for a, aRng in enumerate(p.areaRng)
            for i in p.imgIds
        }

        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for k, cat in enumerate(catIds):
            for a in range(A):
                for m, maxDet in enumerate(p.maxDets):
                    E = [evalImgs[cat, a, i] for i in p.imgIds]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        return precision, recall

    def summarize(self):
        """Returns the same metric dict shape as our clean-room evaluator."""
        precision, recall = self.evaluate_accumulate()

        def _ap(area_idx, thr_idx=None):
            s = precision[:, :, :, area_idx, 0]
            if thr_idx is not None:
                s = s[thr_idx: thr_idx + 1]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else float("nan")

        def _ar(area_idx):
            s = recall[:, :, area_idx, 0]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else float("nan")

        lbl = self.params.areaRngLbl
        out = {
            "AP": _ap(0),
            "AP50": _ap(0, 0),
            "AP75": _ap(0, 5),
            "APm": _ap(lbl.index("medium")),
            "APl": _ap(lbl.index("large")),
            "AR100": _ar(0),
        }
        if "small" in lbl:
            out["APs"] = _ap(lbl.index("small"))
        return out
