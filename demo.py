#!/usr/bin/env python
"""Demo CLI — parity with the reference's
``python demo.py --cfg <yml> --demo <path> -t image|video|camera|time``
(reference demo.py, SURVEY.md §2.1): draw boxes with cv2, write annotated
output; ``-t time`` is the Timer-instrumented latency mode."""

import argparse
import os
import sys

import cv2
import numpy as np

COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (128, 0, 0), (0, 128, 0), (0, 0, 128), (128, 128, 0),
    (128, 0, 128), (0, 128, 128), (64, 0, 0), (0, 64, 0), (0, 0, 64),
    (64, 64, 0), (64, 0, 64), (0, 64, 64), (192, 0, 0), (0, 192, 0),
]


def parse_args():
    parser = argparse.ArgumentParser(description="ssds_tpu demo")
    parser.add_argument("--cfg", dest="config_file", required=True, type=str)
    parser.add_argument("--demo", dest="demo_file", default="", type=str,
                        help="image/video path")
    parser.add_argument("-t", dest="type", default="image",
                        choices=["image", "video", "camera", "time"])
    parser.add_argument("--display", action="store_true")
    parser.add_argument("--threshold", default=0.45, type=float)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def draw(img, boxes, labels, scores, class_names=None):
    for box, label, score in zip(boxes, labels, scores):
        color = COLORS[int(label) % len(COLORS)]
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(img, p1, p2, color, 2)
        name = class_names[int(label)] if class_names else str(int(label))
        cv2.putText(img, f"{name}:{score:.2f}", (p1[0], max(0, p1[1] - 4)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return img


def demo():
    args = parse_args()
    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.detector import ObjectDetector
    from ssds_tpu.data.voc import VOC_CLASSES
    from ssds_tpu.utils.timer import Timer

    cfg = cfg_from_file(args.config_file)
    detector = ObjectDetector(cfg)
    names = VOC_CLASSES if cfg.DATASET.DATASET == "voc" else None

    if args.type == "image":
        img = cv2.imread(args.demo_file, cv2.IMREAD_COLOR)
        boxes, labels, scores = detector.predict(img, args.threshold)
        img = draw(img, boxes, labels, scores, names)
        out = os.path.splitext(args.demo_file)[0] + "_out.jpg"
        cv2.imwrite(out, img)
        print(f"wrote {out} ({len(boxes)} detections)")
    elif args.type in ("video", "camera"):
        src = 0 if args.type == "camera" else args.demo_file
        cap = cv2.VideoCapture(src)
        writer = None
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            boxes, labels, scores = detector.predict(frame, args.threshold)
            frame = draw(frame, boxes, labels, scores, names)
            if writer is None and args.type == "video":
                out = os.path.splitext(args.demo_file)[0] + "_out.avi"
                writer = cv2.VideoWriter(
                    out, cv2.VideoWriter_fourcc(*"XVID"),
                    cap.get(cv2.CAP_PROP_FPS) or 25,
                    (frame.shape[1], frame.shape[0]))
            if writer is not None:
                writer.write(frame)
            if args.display:
                cv2.imshow("ssds_tpu", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
        cap.release()
        if writer is not None:
            writer.release()
    elif args.type == "time":
        if args.demo_file and os.path.exists(args.demo_file):
            img = cv2.imread(args.demo_file, cv2.IMREAD_COLOR)
        else:
            img = (np.random.rand(480, 640, 3) * 255).astype(np.uint8)
        timer = Timer()
        lat = []
        for i in range(110):
            timer.tic()
            (boxes, labels, scores), times = detector.predict(
                img, args.threshold, check_time=True)
            dt = timer.toc(average=False)
            if i >= 10:  # skip warmup
                lat.append(dt)
            if i % 20 == 0:
                print({k: f"{v * 1000:.2f}ms" for k, v in times.items()})
        lat = np.asarray(lat)
        print(f"p50={np.percentile(lat, 50) * 1000:.2f}ms "
              f"p90={np.percentile(lat, 90) * 1000:.2f}ms "
              f"fps={1.0 / lat.mean():.1f}")


if __name__ == "__main__":
    demo()
