"""Faithful ``pycocotools`` substitute for running the REFERENCE evaluators
as oracles (the environment has no pycocotools wheel).

* ``pycocotools.mask`` is backed by ``sam3_lora_tpu.ops.rle`` — whose codec is
  byte-identical to pycocotools' (tests/test_native.py) — with ``iou`` /
  ``merge`` computed on decoded masks (exact, fine at test scale).
* ``pycocotools.coco.COCO`` and ``pycocotools.cocoeval.COCOeval`` implement
  the stock pycocotools algorithms (createIndex / getAnnIds / loadRes;
  _prepare / computeIoU / evaluateImg / accumulate / summarize with the
  canonical greedy matcher and 101-point AP interpolation).

This lets the reference's own vendored evaluator code
(``sam3/eval/cgf1_eval.py``, ``sam3/eval/coco_eval.py`` — which subclasses
COCO/COCOeval and overrides the metric math) run unmodified as a numerical
oracle for ``sam3_lora_tpu.eval``.

Call :func:`install` BEFORE ``tests.ref_oracle.install_stubs`` — the oracle's
stub helper only fills in modules that are absent from ``sys.modules``.
"""

from __future__ import annotations

import copy
import sys
import time
import types
from collections import defaultdict

import numpy as np

from sam3_lora_tpu.ops.rle import (
    polygons_to_mask,
    rle_area,
    rle_decode,
    rle_encode,
)

# --------------------------------------------------------------------------- #
# pycocotools.mask
# --------------------------------------------------------------------------- #


def _as_mask(obj, h=None, w=None):
    """RLE dict | polygon list | (H,W) array -> (H,W) uint8 mask."""
    if isinstance(obj, dict):
        return rle_decode(obj)
    return np.asarray(obj, dtype=np.uint8)


def encode(mask):
    """F-order uint8 (H,W) or (H,W,N) -> RLE dict(s) (counts as bytes)."""
    mask = np.asarray(mask)
    if mask.ndim == 3:
        return [encode(mask[:, :, i]) for i in range(mask.shape[2])]
    r = rle_encode(mask.astype(np.uint8))
    c = r["counts"]
    return {"size": r["size"], "counts": c.encode("ascii") if isinstance(c, str) else c}


def decode(rleObjs):
    if isinstance(rleObjs, dict):
        return rle_decode(rleObjs)
    if len(rleObjs) == 0:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack([rle_decode(r) for r in rleObjs], axis=2)


def area(rleObjs):
    if isinstance(rleObjs, dict):
        return np.uint32(rle_area(rleObjs))
    return np.array([rle_area(r) for r in rleObjs], dtype=np.uint32)


def toBbox(rleObjs):
    single = isinstance(rleObjs, dict)
    rles = [rleObjs] if single else rleObjs
    out = np.zeros((len(rles), 4), dtype=np.float64)
    for i, r in enumerate(rles):
        m = rle_decode(r)
        ys, xs = np.nonzero(m)
        if len(ys):
            x0, x1 = xs.min(), xs.max()
            y0, y1 = ys.min(), ys.max()
            out[i] = [x0, y0, x1 - x0 + 1, y1 - y0 + 1]
    return out[0] if single else out


def merge(rleObjs, intersect=0):
    if len(rleObjs) == 0:
        raise ValueError("merge of empty list")
    m = rle_decode(rleObjs[0]).astype(bool)
    for r in rleObjs[1:]:
        n = rle_decode(r).astype(bool)
        m = (m & n) if intersect else (m | n)
    return encode(m.astype(np.uint8))


def frPyObjects(pyobj, h, w):
    """Polygons / uncompressed RLE / box(es) -> RLE(s), pycocotools semantics."""
    if isinstance(pyobj, dict):  # uncompressed RLE {'counts': list, 'size': ...}
        return encode(rle_decode(pyobj))
    if isinstance(pyobj, (list, tuple)) and len(pyobj) and isinstance(
        pyobj[0], (list, tuple, np.ndarray)
    ):
        first = pyobj[0]
        if isinstance(first, (list, tuple, np.ndarray)) and len(first) == 4 and not isinstance(
            first[0], (list, tuple)
        ):
            # Nx4 boxes xywh
            out = []
            for b in pyobj:
                x, y, bw, bh = [float(v) for v in b]
                m = np.zeros((h, w), np.uint8)
                m[int(round(y)) : int(round(y + bh)), int(round(x)) : int(round(x + bw))] = 1
                out.append(encode(m))
            return out
        # list of polygons
        return [encode(polygons_to_mask([p], h, w)) for p in pyobj]
    if isinstance(pyobj, (list, tuple)):  # single flat polygon
        return encode(polygons_to_mask([pyobj], h, w))
    raise TypeError(f"unsupported frPyObjects input: {type(pyobj)}")


def _box_iou_xywh(d, g, iscrowd):
    d = np.asarray(d, dtype=np.float64).reshape(-1, 4)
    g = np.asarray(g, dtype=np.float64).reshape(-1, 4)
    out = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        gx0, gy0, gw, gh = gb
        ga = gw * gh
        for i, db in enumerate(d):
            dx0, dy0, dw, dh = db
            da = dw * dh
            iw = min(dx0 + dw, gx0 + gw) - max(dx0, gx0)
            ih = min(dy0 + dh, gy0 + gh) - max(dy0, gy0)
            inter = max(iw, 0.0) * max(ih, 0.0)
            union = da if (iscrowd is not None and len(iscrowd) and iscrowd[j]) else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def iou(dt, gt, iscrowd):
    """pycocotools maskUtils.iou: dt x gt IoU matrix; crowd GT -> union=area(dt)."""
    if len(dt) == 0 or len(gt) == 0:
        return []
    if isinstance(dt, np.ndarray) or (
        isinstance(dt[0], (list, tuple, np.ndarray)) and not isinstance(dt[0], dict)
    ):
        return _box_iou_xywh(dt, gt, iscrowd)
    dm = [rle_decode(r).astype(bool) for r in dt]
    gm = [rle_decode(r).astype(bool) for r in gt]
    out = np.zeros((len(dm), len(gm)))
    for j, g in enumerate(gm):
        ga = g.sum()
        crowd = bool(iscrowd[j]) if iscrowd is not None and len(iscrowd) else False
        for i, d in enumerate(dm):
            da = d.sum()
            inter = np.logical_and(d, g).sum()
            union = da if crowd else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


# --------------------------------------------------------------------------- #
# pycocotools.coco.COCO
# --------------------------------------------------------------------------- #


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset, self.anns, self.cats, self.imgs = {}, {}, {}, {}
        self.imgToAnns, self.catToImgs = defaultdict(list), defaultdict(list)
        if annotation_file is not None:
            import json

            if isinstance(annotation_file, str):
                with open(annotation_file) as f:
                    dataset = json.load(f)
            else:
                dataset = annotation_file
            assert isinstance(dataset, dict)
            self.dataset = dataset
            self.createIndex()

    def createIndex(self):
        anns, cats, imgs = {}, {}, {}
        imgToAnns, catToImgs = defaultdict(list), defaultdict(list)
        if "annotations" in self.dataset:
            for ann in self.dataset["annotations"]:
                imgToAnns[ann["image_id"]].append(ann)
                anns[ann["id"]] = ann
        if "images" in self.dataset:
            for img in self.dataset["images"]:
                imgs[img["id"]] = img
        if "categories" in self.dataset:
            for cat in self.dataset["categories"]:
                cats[cat["id"]] = cat
        if "annotations" in self.dataset and "categories" in self.dataset:
            for ann in self.dataset["annotations"]:
                catToImgs[ann["category_id"]].append(ann["image_id"])
        self.anns, self.imgToAnns = anns, imgToAnns
        self.catToImgs, self.imgs, self.cats = catToImgs, imgs, cats

    def info(self):
        pass

    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == len(catIds) == len(areaRng) == 0:
            anns = self.dataset.get("annotations", [])
        else:
            if len(imgIds) > 0:
                lists = [self.imgToAnns[i] for i in imgIds if i in self.imgToAnns]
                anns = [a for l in lists for a in l]
            else:
                anns = self.dataset.get("annotations", [])
            if len(catIds) > 0:
                anns = [a for a in anns if a["category_id"] in catIds]
            if len(areaRng) > 0:
                anns = [
                    a for a in anns if areaRng[0] < a["area"] < areaRng[1]
                ]
        if iscrowd is not None:
            return [a["id"] for a in anns if a["iscrowd"] == iscrowd]
        return [a["id"] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]):
        cats = self.dataset.get("categories", [])
        if catNms:
            cats = [c for c in cats if c["name"] in catNms]
        if supNms:
            cats = [c for c in cats if c.get("supercategory") in supNms]
        if catIds:
            cats = [c for c in cats if c["id"] in catIds]
        return [c["id"] for c in cats]

    def getImgIds(self, imgIds=[], catIds=[]):
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds) == len(catIds) == 0:
            ids = set(self.imgs.keys())
        else:
            ids = set(imgIds) if imgIds else set(self.imgs.keys())
            for i, catId in enumerate(catIds):
                if i == 0 and not imgIds:
                    ids = set(self.catToImgs[catId])
                else:
                    ids &= set(self.catToImgs[catId])
        return list(ids)

    def loadAnns(self, ids=[]):
        if isinstance(ids, (list, tuple, np.ndarray)):
            return [self.anns[i] for i in ids]
        return [self.anns[ids]]

    def loadCats(self, ids=[]):
        if isinstance(ids, (list, tuple, np.ndarray)):
            return [self.cats[i] for i in ids]
        return [self.cats[ids]]

    def loadImgs(self, ids=[]):
        if isinstance(ids, (list, tuple, np.ndarray)):
            return [self.imgs[i] for i in ids]
        return [self.imgs[ids]]

    def loadRes(self, resFile):
        """Stock pycocotools loadRes (results list -> result COCO object)."""
        import json

        res = COCO()
        res.dataset["images"] = [img for img in self.dataset["images"]]
        if isinstance(resFile, str):
            with open(resFile) as f:
                anns = json.load(f)
        elif isinstance(resFile, np.ndarray):
            raise TypeError("ndarray results not supported in shim")
        else:
            anns = resFile
        assert isinstance(anns, list)
        annsImgIds = [ann["image_id"] for ann in anns]
        assert set(annsImgIds) == (set(annsImgIds) & set(self.getImgIds()))
        if len(anns) and "bbox" in anns[0] and "segmentation" not in anns[0]:
            res.dataset["categories"] = copy.deepcopy(self.dataset["categories"])
            for idx, ann in enumerate(anns):
                bb = ann["bbox"]
                ann["area"] = bb[2] * bb[3]
                ann["id"] = idx + 1
                ann["iscrowd"] = 0
        elif len(anns) and "segmentation" in anns[0]:
            res.dataset["categories"] = copy.deepcopy(self.dataset["categories"])
            for idx, ann in enumerate(anns):
                ann["area"] = float(area(ann["segmentation"]))
                if "bbox" not in ann:
                    ann["bbox"] = list(toBbox(ann["segmentation"]))
                ann["id"] = idx + 1
                ann["iscrowd"] = 0
        res.dataset["annotations"] = anns
        res.createIndex()
        return res

    def annToRLE(self, ann):
        t = self.imgs[ann["image_id"]]
        h, w = t["height"], t["width"]
        segm = ann["segmentation"]
        if isinstance(segm, list):
            rles = frPyObjects(segm, h, w)
            return merge(rles)
        if isinstance(segm.get("counts"), list):
            return frPyObjects(segm, h, w)
        return segm

    def annToMask(self, ann):
        return decode(self.annToRLE(ann))


# --------------------------------------------------------------------------- #
# pycocotools.cocoeval (stock algorithm)
# --------------------------------------------------------------------------- #


class Params:
    def setDetParams(self):
        self.imgIds = []
        self.catIds = []
        self.iouThrs = np.linspace(0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        self.recThrs = np.linspace(0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True)
        self.maxDets = [1, 10, 100]
        self.areaRng = [
            [0**2, 1e5**2], [0**2, 32**2], [32**2, 96**2], [96**2, 1e5**2],
        ]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1

    def __init__(self, iouType="segm"):
        if iouType in ("segm", "bbox"):
            self.setDetParams()
        else:
            raise ValueError("iouType not supported in shim")
        self.iouType = iouType
        self.useSegm = None


class COCOeval:
    def __init__(self, cocoGt=None, cocoDt=None, iouType="segm"):
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.evalImgs = defaultdict(list)
        self.eval = {}
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        self.params = Params(iouType=iouType)
        self._paramsEval = {}
        self.stats = []
        self.ious = {}
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    def _prepare(self):
        p = self.params

        def _toMask(anns, coco):
            for ann in anns:
                ann["segmentation"] = coco.annToRLE(ann)

        if p.useCats:
            gts = self.cocoGt.loadAnns(
                self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds)
            )
            dts = self.cocoDt.loadAnns(
                self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds)
            )
        else:
            gts = self.cocoGt.loadAnns(self.cocoGt.getAnnIds(imgIds=p.imgIds))
            dts = self.cocoDt.loadAnns(self.cocoDt.getAnnIds(imgIds=p.imgIds))
        if p.iouType == "segm":
            _toMask(gts, self.cocoGt)
            _toMask(dts, self.cocoDt)
        for gt in gts:
            gt["ignore"] = gt["ignore"] if "ignore" in gt else 0
            gt["ignore"] = "iscrowd" in gt and gt["iscrowd"]
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)
        self.evalImgs = defaultdict(list)
        self.eval = {}

    def computeIoU(self, imgId, catId):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [_ for cId in p.catIds for _ in self._gts[imgId, cId]]
            dt = [_ for cId in p.catIds for _ in self._dts[imgId, cId]]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[0 : p.maxDets[-1]]
        if p.iouType == "segm":
            g = [g["segmentation"] for g in gt]
            d = [d["segmentation"] for d in dt]
        else:
            g = [g["bbox"] for g in gt]
            d = [d["bbox"] for d in dt]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        return iou(d, g, iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [_ for cId in p.catIds for _ in self._gts[imgId, cId]]
            dt = [_ for cId in p.catIds for _ in self._dts[imgId, cId]]
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
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = (
            self.ious[imgId, catId][:, gtind]
            if len(self.ious[imgId, catId]) > 0
            else self.ious[imgId, catId]
        )
        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    m = -1
                    iou_best = min([t, 1 - 1e-10])
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou_best:
                            continue
                        iou_best = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def evaluate(self):
        p = self.params
        if p.useSegm is not None:
            p.iouType = "segm" if p.useSegm == 1 else "bbox"
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        p.maxDets = sorted(p.maxDets)
        self.params = p
        self._prepare()
        catIds = p.catIds if p.useCats else [-1]
        self.ious = {
            (imgId, catId): self.computeIoU(imgId, catId)
            for imgId in p.imgIds
            for catId in catIds
        }
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet)
            for catId in catIds
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]
        self._paramsEval = copy.deepcopy(self.params)

    def accumulate(self, p=None):
        if not self.evalImgs:
            print("Please run evaluate() first")
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds) if p.useCats else 1
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))
        _pe = self._paramsEval
        catIds = _pe.catIds if _pe.useCats else [-1]
        setK = set(catIds)
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        k_list = [n for n, k in enumerate(p.catIds) if k in setK]
        m_list = [m for n, m in enumerate(p.maxDets) if m in setM]
        a_list = [
            n for n, a in enumerate(map(lambda x: tuple(x), p.areaRng)) if a in setA
        ]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, maxDet in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E]
                    )
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E], axis=1
                    )[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1
                    )[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "date": time.strftime("%Y-%m-%d"),
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }

    def summarize(self):
        def _summarize(ap=1, iouThr=None, areaRng="all", maxDets=100):
            p = self.params
            aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            if ap == 1:
                s = self.eval["precision"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval["recall"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return np.mean(s[s > -1])

        stats = np.zeros((12,))
        stats[0] = _summarize(1)
        stats[1] = _summarize(1, iouThr=0.5, maxDets=self.params.maxDets[2])
        stats[2] = _summarize(1, iouThr=0.75, maxDets=self.params.maxDets[2])
        stats[3] = _summarize(1, areaRng="small", maxDets=self.params.maxDets[2])
        stats[4] = _summarize(1, areaRng="medium", maxDets=self.params.maxDets[2])
        stats[5] = _summarize(1, areaRng="large", maxDets=self.params.maxDets[2])
        stats[6] = _summarize(0, maxDets=self.params.maxDets[0])
        stats[7] = _summarize(0, maxDets=self.params.maxDets[1])
        stats[8] = _summarize(0, maxDets=self.params.maxDets[2])
        stats[9] = _summarize(0, areaRng="small", maxDets=self.params.maxDets[2])
        stats[10] = _summarize(0, areaRng="medium", maxDets=self.params.maxDets[2])
        stats[11] = _summarize(0, areaRng="large", maxDets=self.params.maxDets[2])
        self.stats = stats


# --------------------------------------------------------------------------- #
# install into sys.modules
# --------------------------------------------------------------------------- #


def install():
    """Register this shim as the real ``pycocotools`` (idempotent). Must run
    before ``tests.ref_oracle.install_stubs`` for the reference evaluators to
    see real COCO/COCOeval classes rather than inert stubs."""
    this = sys.modules[__name__]
    pkg = types.ModuleType("pycocotools")
    pkg.__path__ = []
    mask_mod = types.ModuleType("pycocotools.mask")
    for name in ("encode", "decode", "area", "toBbox", "merge", "frPyObjects", "iou"):
        setattr(mask_mod, name, getattr(this, name))
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = COCO
    eval_mod = types.ModuleType("pycocotools.cocoeval")
    eval_mod.COCOeval = COCOeval
    eval_mod.Params = Params
    pkg.mask = mask_mod
    pkg.coco = coco_mod
    pkg.cocoeval = eval_mod
    sys.modules["pycocotools"] = pkg
    sys.modules["pycocotools.mask"] = mask_mod
    sys.modules["pycocotools.coco"] = coco_mod
    sys.modules["pycocotools.cocoeval"] = eval_mod
