from . import attention, boxes, focal, interpolate, masks, nms, posenc, rle, rope, sampling, windows  # noqa: F401
