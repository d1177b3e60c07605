"""Prep pipeline, superpoint-graph, cross-val and visualization tests."""

import os
import pickle

import numpy as np

from ssdr_al_tpu.data.ply import read_ply
from ssdr_al_tpu.data.prepare import (
    nearest_sub_index,
    prepare_s3dis_room,
    write_cloud_artifacts,
)
from ssdr_al_tpu.partition.sp_graph import compute_sp_graph
from ssdr_al_tpu.train.cross_val import score_prediction_plys
from ssdr_al_tpu.utils.visualize import (
    export_semantic3d_labels,
    write_label_ply,
    write_prediction_ply,
    write_superpoint_ply,
)


class TestPrepare:
    def test_write_cloud_artifacts(self, rng, tmp_path):
        xyz = (rng.rand(2000, 3) * 5).astype(np.float32)
        colors = (rng.rand(2000, 3) * 255).astype(np.uint8)
        labels = rng.randint(0, 4, 2000).astype(np.uint8)
        n = write_cloud_artifacts(str(tmp_path), "roomA", xyz, colors, labels, 0.25)
        sub = read_ply(str(tmp_path / "input_0.250" / "roomA.ply"))
        assert len(sub) == n < 2000
        assert 0 <= sub["red"].min() and sub["red"].max() <= 1.0  # normalized
        with open(tmp_path / "input_0.250" / "roomA_proj.pkl", "rb") as f:
            proj_idx, full_labels = pickle.load(f)
        assert len(proj_idx) == 2000 and proj_idx.max() < n
        np.testing.assert_array_equal(full_labels, labels)
        # proj maps each full point to its nearest sub point
        sub_xyz = np.vstack([sub["x"], sub["y"], sub["z"]]).T
        d_proj = np.linalg.norm(xyz[:5] - sub_xyz[proj_idx[:5]], axis=1)
        for i in range(5):
            d_all = np.linalg.norm(sub_xyz - xyz[i], axis=1)
            assert d_proj[i] <= d_all.min() + 1e-5

    def test_prepare_s3dis_room_from_txt(self, rng, tmp_path):
        anno = tmp_path / "Area_9" / "office_1" / "Annotations"
        os.makedirs(anno)
        for cname, n in (("chair_1", 50), ("table_3", 60), ("staris_1", 30)):
            pts = np.hstack([
                rng.rand(n, 3) * 3,
                (rng.rand(n, 3) * 255).astype(int),
            ])
            np.savetxt(anno / f"{cname}.txt", pts, fmt="%.3f")
        out = tmp_path / "out"
        prepare_s3dis_room(str(anno), str(out), "Area_9_office_1", grid_size=0.1)
        orig = read_ply(str(out / "original_ply" / "Area_9_office_1.ply"))
        assert len(orig) == 140
        # 'staris' falls back to clutter (label 12)
        assert set(np.unique(orig["class"])) <= {8, 7, 12}

    def test_nearest_sub_index(self, rng):
        full = rng.rand(500, 3).astype(np.float32)
        sub = full[::7]
        idx = nearest_sub_index(full, sub)
        np.testing.assert_array_equal(idx[::7], np.arange(len(sub)))


class TestSpGraph:
    def test_sp_graph_features(self, rng):
        # two spatially separated planar clusters
        a = rng.rand(60, 3).astype(np.float32)
        b = rng.rand(60, 3).astype(np.float32) + [2.0, 0, 0]
        xyz = np.vstack([a, b])
        in_comp = np.array([0] * 60 + [1] * 60)
        comps = [np.arange(60), np.arange(60, 120)]
        labels = np.array([1] * 60 + [3] * 60)
        g = compute_sp_graph(xyz, 0, in_comp, comps, labels, n_labels=4)
        assert g["sp_centroids"].shape == (2, 3)
        np.testing.assert_allclose(g["sp_centroids"][1] - g["sp_centroids"][0],
                                   [2.0, 0, 0], atol=0.2)
        assert g["sp_labels"][0].argmax() == 1
        assert g["sp_labels"][1].argmax() == 3
        # superedges exist in both directions between the two components
        pairs = set(zip(g["source"][:, 0].tolist(), g["target"][:, 0].tolist()))
        assert (0, 1) in pairs and (1, 0) in pairs
        # se_delta_centroid antisymmetric
        i01 = [i for i, p in enumerate(zip(g["source"][:, 0], g["target"][:, 0]))
               if tuple(p) == (0, 1)][0]
        i10 = [i for i, p in enumerate(zip(g["source"][:, 0], g["target"][:, 0]))
               if tuple(p) == (1, 0)][0]
        np.testing.assert_allclose(
            g["se_delta_centroid"][i01], -g["se_delta_centroid"][i10], atol=1e-5
        )


class TestVisualizeAndCV:
    def test_prediction_ply_scoring(self, rng, tmp_path):
        xyz = rng.rand(300, 3).astype(np.float32)
        gt = rng.randint(0, 4, 300)
        pred = gt.copy()
        pred[:30] = (gt[:30] + 1) % 4  # 10% errors
        write_prediction_ply(str(tmp_path / "room.ply"), xyz, pred, gt)
        result = score_prediction_plys(str(tmp_path), num_classes=4)
        np.testing.assert_allclose(result["oa"], 0.9, atol=1e-6)
        assert 0 < result["miou"] < 1

    def test_label_and_superpoint_plys(self, rng, tmp_path):
        xyz = rng.rand(100, 3).astype(np.float32)
        write_label_ply(str(tmp_path / "l.ply"), xyz, rng.randint(0, 5, 100))
        write_superpoint_ply(str(tmp_path / "s.ply"), xyz, rng.randint(0, 9, 100))
        assert read_ply(str(tmp_path / "l.ply"))["red"].shape == (100,)
        assert read_ply(str(tmp_path / "s.ply"))["superpoint"].max() <= 8

    def test_semantic3d_label_export(self, rng, tmp_path):
        sub_probs = rng.rand(50, 8).astype(np.float32)
        proj = rng.randint(0, 50, 200)
        path = str(tmp_path / "scene.labels")
        preds = export_semantic3d_labels(
            path, sub_probs, proj, label_values=np.arange(1, 9)
        )
        loaded = np.loadtxt(path, dtype=int)
        np.testing.assert_array_equal(loaded, preds)
        assert loaded.min() >= 1 and loaded.max() <= 8
        np.testing.assert_array_equal(
            preds, sub_probs[proj].argmax(1) + 1
        )


class TestProviderH5:
    def test_spg_round_trip(self, rng, tmp_path):
        from ssdr_al_tpu.partition.provider import (
            read_components,
            read_spg,
            write_components,
            write_spg,
        )

        a = rng.rand(40, 3).astype(np.float32)
        b = rng.rand(40, 3).astype(np.float32) + [3, 0, 0]
        xyz = np.vstack([a, b])
        in_comp = np.array([0] * 40 + [1] * 40)
        comps = [np.arange(40), np.arange(40, 80)]
        labels = np.array([0] * 40 + [2] * 40)
        g = compute_sp_graph(xyz, 0, in_comp, comps, labels, n_labels=3)

        p = str(tmp_path / "g.h5")
        write_spg(p, g)
        g2 = read_spg(p)
        np.testing.assert_allclose(g2["sp_centroids"], g["sp_centroids"])
        np.testing.assert_array_equal(g2["source"], g["source"])
        np.testing.assert_array_equal(g2["sp_labels"], g["sp_labels"])

        cp = str(tmp_path / "c.h5")
        write_components(cp, comps, in_comp)
        comps2, in_comp2 = read_components(cp)
        np.testing.assert_array_equal(in_comp2, in_comp)
        for c1, c2 in zip(comps, comps2):
            np.testing.assert_array_equal(c1, c2)


class TestProviderReaders:
    """Raw-format readers + full-res upsampling (reference provider.py
    185-372, 593-651) on synthetic files."""

    def test_read_s3dis_format(self, rng, tmp_path):
        from ssdr_al_tpu.partition.provider import read_s3dis_format

        room = tmp_path / "office_1"
        anno = room / "Annotations"
        os.makedirs(anno)
        pts_a = np.hstack([rng.rand(40, 3), rng.randint(0, 255, (40, 3))])
        pts_b = np.hstack([rng.rand(30, 3) + 2, rng.randint(0, 255, (30, 3))])
        np.savetxt(anno / "chair_1.txt", pts_a, fmt="%.4f")
        np.savetxt(anno / "wall_2.txt", pts_b, fmt="%.4f")
        np.savetxt(room / "office_1.txt", np.vstack([pts_a, pts_b]), fmt="%.4f")

        xyz, rgb, labels, obj_idx = read_s3dis_format(str(room / "office_1.txt"))
        assert xyz.shape == (70, 3) and rgb.dtype == np.uint8
        np.testing.assert_array_equal(labels[:40], 9)   # chair
        np.testing.assert_array_equal(labels[40:], 3)   # wall
        assert set(np.unique(obj_idx)) == {1, 2}

    def test_read_vkitti_format(self, rng, tmp_path):
        from ssdr_al_tpu.partition.provider import read_vkitti_format

        data = np.hstack([rng.rand(50, 6), rng.randint(0, 14, (50, 1))])
        data[0, -1] = 13  # becomes 14 -> remapped to 0
        path = tmp_path / "scene.npy"
        np.save(path, data)
        xyz, rgb, labels = read_vkitti_format(str(path))
        assert labels[0] == 0
        expected = data[:, -1] + 1
        expected[expected == 14] = 0
        np.testing.assert_array_equal(labels, expected)

    def test_read_semantic3d_format_chunked(self, rng, tmp_path):
        from ssdr_al_tpu.partition.provider import read_semantic3d_format

        n, n_class = 500, 4
        pts = np.hstack([
            rng.rand(n, 3) * 3,                         # xyz
            rng.rand(n, 1),                             # intensity
            rng.randint(0, 255, (n, 3)),                # rgb
        ])
        labels = rng.randint(0, n_class + 1, n)
        np.savetxt(tmp_path / "scan.txt", pts, fmt="%.4f")
        np.savetxt(tmp_path / "scan.labels", labels, fmt="%d")

        xyz, rgb, hist = read_semantic3d_format(
            str(tmp_path / "scan.txt"), n_class,
            str(tmp_path / "scan.labels"), voxel_width=0.5, ver_batch=200,
        )
        assert xyz.shape[1] == 3 and rgb.dtype == np.uint8
        assert hist.shape[1] == n_class + 1
        # chunked histograms account for every input point
        assert hist.sum() == n
        # unlabeled path (test scans)
        xyz2, rgb2 = read_semantic3d_format(
            str(tmp_path / "scan.txt"), 0, "", voxel_width=0.5, ver_batch=200)
        assert len(xyz2) == len(xyz)

    def test_prune_voxel_histogram(self, rng):
        from ssdr_al_tpu.partition.provider import prune_voxel

        xyz = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5, 5, 5]])
        rgb = np.array([[10, 0, 0], [30, 0, 0], [200, 100, 50]])
        labels = np.array([1, 2, 1])
        sub_xyz, sub_rgb, hist = prune_voxel(xyz, 1.0, rgb, labels, n_class=3)
        assert len(sub_xyz) == 2
        # first voxel: barycenter + label counts {1:1, 2:1}
        np.testing.assert_allclose(sub_xyz[0], [0.15, 0.15, 0.15], atol=1e-6)
        assert sub_rgb[0][0] == 20
        np.testing.assert_array_equal(hist[0], [0, 1, 1, 0])
        np.testing.assert_array_equal(hist[1], [0, 1, 0, 0])

    def test_reduced_labels2full_and_interpolate(self, rng, tmp_path):
        from ssdr_al_tpu.partition.provider import (
            interpolate_labels,
            interpolate_labels_batch,
            reduced_labels2full,
        )

        comps = [np.array([0, 2, 4]), np.array([1, 3])]
        full = reduced_labels2full(np.array([7, 9]), comps, 5)
        np.testing.assert_array_equal(full, [7, 9, 7, 9, 7])

        xyz = rng.rand(40, 3).astype(np.float32)
        labels = rng.randint(0, 5, 40)
        up = xyz[rng.randint(0, 40, 100)] + rng.randn(100, 3) * 1e-4
        got = interpolate_labels(up, xyz, labels)
        # every upsampled point is ~on top of its source point
        from scipy.spatial import cKDTree

        _, nn = cKDTree(xyz).query(up, k=1)
        np.testing.assert_array_equal(got, labels[nn])
        # chunked variant
        got_b = interpolate_labels(up, xyz, labels, ver_batch=30)
        np.testing.assert_array_equal(got_b, got)
        # one-hot labels take argmax first
        onehot = np.eye(5)[labels]
        got_oh = interpolate_labels(up, xyz, onehot)
        np.testing.assert_array_equal(got_oh, got)
        # file-batched variant
        raw = np.hstack([up, np.zeros((100, 4))])
        np.savetxt(tmp_path / "raw.txt", raw, fmt="%.6f")
        got_f = interpolate_labels_batch(str(tmp_path / "raw.txt"), xyz,
                                         labels, ver_batch=40)
        np.testing.assert_array_equal(got_f, got.astype(np.uint8))


class TestProviderExporters:
    def test_geof_prediction_error_embedding_plys(self, rng, tmp_path):
        from ssdr_al_tpu.data.ply import read_ply
        from ssdr_al_tpu.partition.provider import (
            embedding2ply,
            error2ply,
            geof2ply,
            prediction2ply,
        )

        n = 60
        xyz = rng.rand(n, 3).astype(np.float32)
        geof = rng.rand(n, 4).astype(np.float32)
        geof2ply(str(tmp_path / "g.ply"), xyz, geof)
        g = read_ply(str(tmp_path / "g.ply"))
        np.testing.assert_array_equal(
            g["red"], (255 * geof[:, 0]).astype(np.uint8))

        pred = rng.randint(0, 14, n)
        prediction2ply(str(tmp_path / "p.ply"), xyz, pred, 13, "s3dis")
        p = read_ply(str(tmp_path / "p.ply"))
        from ssdr_al_tpu.partition.provider import get_color_from_label

        assert p["red"][0] == get_color_from_label(pred[0], "s3dis")[0]
        # probability input takes argmax
        probs = np.eye(14)[pred]
        prediction2ply(str(tmp_path / "p2.ply"), xyz, probs, 13, "s3dis")
        p2 = read_ply(str(tmp_path / "p2.ply"))
        np.testing.assert_array_equal(p2["red"], p["red"])

        rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
        labels = rng.randint(0, 4, n)
        error2ply(str(tmp_path / "e.ply"), xyz, rgb, labels, pred % 4)
        assert read_ply(str(tmp_path / "e.ply"))["green"].shape == (n,)

        emb = rng.randn(n, 32).astype(np.float32)
        embedding2ply(str(tmp_path / "emb.ply"), xyz, emb)
        assert read_ply(str(tmp_path / "emb.ply"))["blue"].shape == (n,)
