"""CLI / `ray job submit` entrypoint.

    python -m tippecanoe_ray --input /path/table.parquet \
        --out /tmp/tiles --maxzoom 14 --droprate 2.5 [--resume] \
        [--id-col image_id] [--rule fnv|lcg] [--mbtiles out.mbtiles]

Runs the full drop-ladder pyramid as a streaming Ray workload with the
resumable parquet sink; optionally packages to mbtiles. On a cluster:
    ray job submit -- python -m tippecanoe_ray --input ... --out ...

Tool subcommands (each byte-identical to its reference binary):
    python -m tippecanoe_ray tilejoin  -o out.mbtiles [-c csv] [...] in...
    python -m tippecanoe_ray decode    [-x row] [...] tileset [z x y]
    python -m tippecanoe_ray enumerate tileset...
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def layer_name_from_path(path: str, source_index: int = 0) -> str:
    """Default layer name from the input filename (main.cpp:1360-1408):
    last path component, strip known extensions repeatedly, keep only
    [A-Za-z0-9_] and high-bit (UTF-8 multibyte) bytes; 'unknown{i}'
    when empty or structurally invalid UTF-8."""
    import os

    from tippecanoe_ray.functions.text import check_utf8

    trunc = os.path.basename(path.rstrip("/"))
    trims = (".json", ".geojson", ".geobuf", ".mbtiles", ".pmtiles",
             ".csv", ".gz")
    again = True
    while again:
        again = False
        for t in trims:
            if len(trunc) > len(t) and trunc.endswith(t):
                trunc = trunc[: -len(t)]
                again = True
    raw = trunc.encode("utf-8")
    out = bytes(
        c for c in raw
        if (65 <= c <= 90) or (97 <= c <= 122) or (48 <= c <= 57)
        or c == 95 or c >= 0x80
    )
    if not out or check_utf8(out):
        return f"unknown{source_index}"
    return out.decode("utf-8")


def _parse_feature_filter(args) -> dict | None:
    """-j inline / -J file (read_filter / parse_filter,
    evaluator.cpp:368-398): the document must be a {layer: expr} hash
    (evaluate() exits on non-hash filters)."""
    doc = None
    if getattr(args, "feature_filter_file", None):
        with open(args.feature_filter_file) as f:
            doc = json.load(f)
    elif getattr(args, "feature_filter", None):
        doc = json.loads(args.feature_filter)
    if doc is None:
        return None
    if not isinstance(doc, dict):
        raise SystemExit(f"filter is not a hash: {doc!r}")
    return doc


def _build_from_geo(args, cfg):
    """GeoJSON / geobuf / geocsv input: points ride the point pipeline,
    lines/polygons the vector cascade; the two tilesets merge."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tippecanoe_ray.functions.spatial import encode_quadkey
    from tippecanoe_ray.pipelines.pyramid import build_pyramid_from_narrow

    vec_attrs: dict = {}
    from tippecanoe_ray.pipelines.tilejoin import merge_tilesets
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )

    inputs = args.input if isinstance(args.input, list) else [args.input]
    named = dict(getattr(args, "named_layers", None) or {})  # path -> -L name
    layer = (args.layer_name or named.get(inputs[0])
             or layer_name_from_path(inputs[0]))
    cfg.layer_name = layer

    def _offset_seq(t, off):
        if t is None or off == 0 or len(t) == 0:
            return t
        import pyarrow.compute as _pc

        i = t.column_names.index("seq")
        return t.set_column(i, "seq", _pc.add(t["seq"], off).cast(t["seq"].type))

    pts_parts: list = []
    vec_parts: list = []
    vec_ds = None  # fragment-parallel NDJSON geometry Dataset
    merged_layers: dict = {}
    total = 0
    # --generate-ids: the id is the reference's serialize seq + 1,
    # which for parallel-parsed inputs (RFC 7464 text sequences) is
    # BYTE-OFFSET-based, and across files accumulates bytes (parallel)
    # or feature counts (serial) — main.cpp:472,1705 / serial.cpp:601
    genid_ref: dict = {}
    ref_off = 0
    # the Dataset ingest path needs no driver-side Table: single NDJSON
    # input, no provisional full-table scans (-zg / -Bg / -rg / -ag)
    parallel_ok = (
        len(inputs) == 1
        and not getattr(args, "guess_zoom", False)
        and not getattr(args, "calculate_feature_density", False)
        and args.basezoom >= 0
        and args.droprate >= 0
    )
    for src_i, path in enumerate(inputs):
        lower = path.lower()
        pts_i = None
        vec_i = None
        n_i = None
        if lower.endswith(".csv"):
            # geocsv rides the vector pipeline like every other source
            # so its attributes flow through the side table
            # (parse_geocsv geocsv.cpp:14-140 → serialize_feature)
            from tippecanoe_ray.sources.geocsv import read_geocsv_vector

            vec_i, attrs_csv = read_geocsv_vector(
                path,
                empty_null=getattr(args, "empty_csv_columns_are_null", False),
            )
            n_i = len(vec_i)
            for s, v in attrs_csv.items():
                vec_attrs[s + total] = v
        elif lower.endswith(".fgb"):
            from tippecanoe_ray.sources.flatgeobuf import read_flatgeobuf

            pts_i, vec_i = read_flatgeobuf(path)
            n_i = (len(pts_i) if pts_i is not None else 0) + (
                len(vec_i) if vec_i is not None else 0)
        elif lower.endswith(".geobuf"):
            from tippecanoe_ray.sources.geobuf import read_geobuf_vector

            vec_i = read_geobuf_vector(path)
            n_i = len(vec_i)
        else:
            from tippecanoe_ray.sources.geojson import (
                read_geojson_attrs, read_geojson_parallel,
                read_geojson_vector,
            )

            # all geometry runs ride ONE pipeline like the reference;
            # gamma / -K / as-needed strategies run in the vector
            # pipeline's zoom-consensus driver (tile.cpp:3272-3623)
            par = (
                read_geojson_parallel(
                    path, target_bytes=args.fragment_bytes,
                    projection=args.projection)
                if parallel_ok else None
            )
            if par is not None:
                vec_ds, attrs_i = par
                vec_i = None
            else:
                vec_i = read_geojson_vector(path, projection=args.projection)
                attrs_i = read_geojson_attrs(path)
            n_i = attrs_i.pop("__n__", 0)
            lay_i = attrs_i.pop("__layers__", {})
            sid_i = attrs_i.pop("__strids__", {})
            for s, v in attrs_i.items():
                vec_attrs[s + total] = v
            for s, nm in lay_i.items():
                merged_layers[s + total] = nm
            if getattr(args, "convert_stringified_ids", False):
                # -aI: string ids that strtoull fully consumes and that
                # round-trip exactly become numeric ids
                # (geojson.cpp:143-166)
                for s, sid in sid_i.items():
                    fid = _strtoull_id(sid, exact=True)
                    if fid is not None:
                        old = vec_attrs.get(s + total)
                        rows = old[1] if old else []
                        vec_attrs[s + total] = (fid, rows)
        if len(inputs) > 1 and not args.layer_name:
            # per-file layer: -L name, else the filename (main.cpp
            # multi-source layer map); per-feature tippecanoe layers
            # (already in merged_layers) take precedence
            file_layer = named.get(path) or layer_name_from_path(path, src_i)
            for s in range(n_i or 0):
                merged_layers.setdefault(s + total, file_layer)
        if getattr(args, "generate_ids", False):
            rs = None
            if not (lower.endswith(".csv") or lower.endswith(".fgb")
                    or lower.endswith(".geobuf")):
                from tippecanoe_ray.sources.geojson import (
                    reference_parallel_seqs,
                )

                rs = reference_parallel_seqs(path, initial_offset=ref_off)
            if rs is not None:
                seqs, consumed = rs
                for k, v in enumerate(seqs):
                    genid_ref[k + total] = v
                ref_off += consumed
            else:
                for k in range(n_i or 0):
                    genid_ref[k + total] = ref_off + k
                ref_off += n_i or 0
        pts_parts.append(_offset_seq(pts_i, total))
        vec_parts.append(_offset_seq(vec_i, total))
        total += n_i or 0
    vec_attrs["__n__"] = total
    if merged_layers:
        vec_attrs["__layers__"] = merged_layers
    pts_parts = [t for t in pts_parts if t is not None]
    vec_parts = [t for t in vec_parts if t is not None]
    pts_tbl = pa.concat_tables(pts_parts) if pts_parts else None
    vec_tbl = pa.concat_tables(vec_parts) if vec_parts else None
    if getattr(args, "set_attribute", None):
        import json as _json

        from tippecanoe_ray.sources.geojson import _RawNum, stringify_value_sv
        _dec = _json.JSONDecoder(parse_float=_RawNum, parse_int=_RawNum)

        # std::map ordering: keys sorted; existing keys replaced in
        # place, new ones appended after the real attributes
        # (serial.cpp:785-799)
        sets: dict = {}
        for arg in args.set_attribute:
            if arg.startswith("{"):
                for k, v in _dec.decode(arg).items():
                    sets[k] = stringify_value_sv(v)
            else:
                name, _, value = arg.partition(":")
                vt = ("double" if value[:1].isdigit() or value[:1] == "-"
                      else "string")
                sets[name] = (vt, value)
        sets = dict(sorted(sets.items()))
        n_feat = vec_attrs.get("__n__") or (
            max((k for k in vec_attrs if isinstance(k, int)), default=-1) + 1)
        for seq in range(n_feat):
            fid, rows = vec_attrs.get(seq, (None, []))
            rows = list(rows)
            have = {r[0]: i for i, r in enumerate(rows)}
            for k, (vt, s) in sets.items():
                if k in have:
                    rows[have[k]] = (k, vt, s)
                else:
                    rows.append((k, vt, s))
            vec_attrs[seq] = (fid, rows)
    if (getattr(args, "attribute_type", None)
            or getattr(args, "single_precision", False)
            or getattr(args, "maximum_string_attribute_length", 0) > 0):
        # -T name:type coercion, then -pN float32 re-format — applied
        # after --set-attribute and before -y, matching the reference's
        # per-key pass order (serial.cpp:800-811)
        import struct

        from tippecanoe_ray.functions.attributes import _atof, _coerce_one
        from tippecanoe_ray.functions.text import dtoa_milo

        want = dict(s.split(":", 1) for s in (args.attribute_type or []))
        for k, v in list(vec_attrs.items()):
            if not isinstance(k, int):
                continue
            fid, rows = v
            nrows = []
            for name, vt, sval in rows:
                if name in want:
                    vt, sval = _coerce_one(vt, sval, want[name])
                if args.single_precision and vt == "double" and "." in sval:
                    # (float) atof(val) then dtoa_milo (serial.cpp:806)
                    f32 = struct.unpack("f", struct.pack("f", _atof(sval)))[0]
                    sval = dtoa_milo(f32)
                if (args.maximum_string_attribute_length > 0
                        and vt == "string"):
                    # UTF-8-byte truncation (serial.cpp:870-875)
                    sval = _truncate_utf8(
                        sval, args.maximum_string_attribute_length)
                nrows.append((name, vt, sval))
            vec_attrs[k] = (fid, nrows)
    if getattr(args, "use_attribute_for_id", None):
        # take the feature id from a numeric attribute and remove it
        # (serial.cpp:812-847); -aI also admits string-typed values
        name = args.use_attribute_for_id
        conv = getattr(args, "convert_stringified_ids", False)
        for k, v in list(vec_attrs.items()):
            if not isinstance(k, int):
                continue
            fid, rows = v
            nrows = []
            for row in rows:
                if row[0] == name and (row[1] == "double" or conv):
                    nid = _strtoull_id(row[2], exact=False)
                    if nid is not None:
                        fid = nid
                        continue  # attribute consumed by the id
                nrows.append(row)
            vec_attrs[k] = (fid, nrows)
    if getattr(args, "generate_ids", False):
        # --generate-ids: id = reference seq + 1 for features without
        # one (serial.cpp:601-605); seq per genid_ref above
        for s in range(vec_attrs.get("__n__", 0)):
            gid = genid_ref.get(s, s) + 1
            old = vec_attrs.get(s)
            if old is None:
                vec_attrs[s] = (gid, [])
            elif old[0] is None:
                vec_attrs[s] = (gid, old[1])
    if getattr(args, "include", None):
        # -y: keep ONLY the named attributes (include set); ids and
        # the layer map are untouched
        inc = set(args.include)
        for k, v in list(vec_attrs.items()):
            if isinstance(k, int):
                fid, rows = v
                vec_attrs[k] = (fid, [r for r in rows if r[0] in inc])
    if getattr(args, "exclude_all", False):
        # -X: drop every attribute (ids stay, main.cpp exclude_all)
        for k, v in list(vec_attrs.items()):
            if isinstance(k, int):
                vec_attrs[k] = (v[0], [])
    elif getattr(args, "exclude", None):
        exc = set(args.exclude)
        for k, v in list(vec_attrs.items()):
            if isinstance(k, int):
                fid, rows = v
                vec_attrs[k] = (fid, [r for r in rows if r[0] not in exc])
    outs = []
    if pts_tbl is not None and len(pts_tbl):
        wx = pts_tbl["wx"].to_numpy()
        wy = pts_tbl["wy"].to_numpy()
        narrow = ray.data.from_arrow(pa.table({
            "wx": wx, "wy": wy,
            "index": pa.array(encode_quadkey(wx & ~1, wy & ~1), pa.uint64()),
            "seq": pts_tbl["seq"],
        }))
        outs.append(build_pyramid_from_narrow(narrow, cfg, n_rows=len(pts_tbl)))
    if vec_ds is not None or (vec_tbl is not None and len(vec_tbl)):
        scheme = "hilbert" if args.hilbert else "quadkey"
        prov_feats = None
        if getattr(args, "guess_zoom", False):
            # -zg two-phase: ingest at geometry_scale 0 (the provisional
            # MAX_ZOOM leaves gscale 0, main.cpp:3765-3770), guess from
            # the index/vertex spacing, then re-ingest with the final
            # ladder parameters — gscale STAYS 0 for the whole run
            from tippecanoe_ray.stages.stats import guess_vector_zoom

            pv = VectorConfig(maxzoom=24, layer_name=layer,
                              geometry_scale=0, droprate=1.0,
                              index_scheme=scheme)
            prov_feats = ingest_features(vec_tbl, pv)
            mz, dr, bz, premin_mz = guess_vector_zoom(
                prov_feats, cfg.droprate,
                full_detail=args.full_detail or 12,
                low_detail=args.low_detail or 12,
                minimum_maxzoom=args.smallest_maximum_zoom_guess or 0,
                cluster_distance=args.cluster_distance,
                cluster_maxzoom=args.cluster_maxzoom)
            if args.basezoom == -2 and args.basezoom_marker_width == 1:
                # plain -Bg under -zg binds to the PRE-floor maxzoom
                # (main.cpp:2457-2462)
                args.basezoom = premin_mz
            if mz < args.minzoom:
                mz = args.minzoom  # main.cpp:2471-2476
            cfg.maxzoom = args.maxzoom = mz
            cfg.droprate = dr
            if args.basezoom == -1:
                args.basezoom = mz  # main.cpp:2480-2482
        if (getattr(args, "guess_cluster_maxzoom", False)
                and args.cluster_maxzoom >= cfg.maxzoom):
            # -kg: stop clustering one zoom before maxzoom
            # (main.cpp:2485-2488)
            args.cluster_maxzoom = cfg.maxzoom - 1
        if args.basezoom < 0 or cfg.droprate < 0:
            # -Bg/-Bf/-rg/-rf (or -rp with nothing to fit): the densest-
            # tile scan over the sorted index stream (main.cpp:2490-2634)
            from tippecanoe_ray.stages.stats import (
                guess_basezoom_droprate_exact,
            )

            if prov_feats is None:
                pv = VectorConfig(maxzoom=cfg.maxzoom, layer_name=layer,
                                  geometry_scale=0, droprate=1.0,
                                  index_scheme=scheme)
                prov_feats = ingest_features(vec_tbl, pv)
            ix = np.sort(prov_feats["vindex"].to_numpy(
                zero_copy_only=False).astype(np.uint64))
            bz2, dr2 = guess_basezoom_droprate_exact(
                ix, cfg.maxzoom, gamma=args.gamma,
                marker_width=args.basezoom_marker_width,
                basezoom=None if args.basezoom < 0 else args.basezoom,
                droprate=None if cfg.droprate < 0 else cfg.droprate,
                prevent_basezoom_above=getattr(
                    args, "limit_base_zoom_to_maximum_zoom", False),
                scheme=scheme)
            args.basezoom = bz2
            cfg.droprate = dr2
        vcfg = VectorConfig(
            minzoom=cfg.minzoom, maxzoom=cfg.maxzoom, layer_name=layer,
            # "Highest supported detail with maxzoom z is 32-z"
            # (main.cpp:3734-3741); maxzoom itself is clamped to
            # MAX_ZOOM=24 in main()
            detail=min(args.full_detail or 12, 32 - cfg.maxzoom),
            low_detail=min(args.low_detail or 12, 33 - cfg.maxzoom),
            geometry_scale=0 if getattr(args, "guess_zoom", False) else None,
            buffer=args.buffer, droprate=cfg.droprate,
            basezoom=args.basezoom,
            max_tile_size=args.max_tile_bytes,
            prevent_shared_nodes=args.prevent_shared_nodes,
            variable_depth=args.variable_depth,
            prefilter=args.prefilter,
            postfilter=args.postfilter,
            detect_wraparound=args.detect_wraparound,
            prevent_clipping=args.prevent_clipping,
            prevent_duplication=args.prevent_duplication,
            calculate_density=args.calculate_feature_density,
            reorder=args.reorder,
            coalesce=args.coalesce,
            grid_low_zooms=args.grid_low_zooms,
            extra_detail=(args.extra_detail if args.extra_detail is not None
                          else -1),
            filter=_parse_feature_filter(args),
            index_scheme="hilbert" if args.hilbert else "quadkey",
            attribute_accum=_parse_accum(args.accumulate_attribute),
            clip_bboxes=tuple(
                tuple(float(v) for v in s.split(","))
                for s in args.clip_bounding_box
            ),
            max_tile_features=args.max_tile_features,
            drop_densest=args.drop_densest_as_needed,
            coalesce_densest=args.coalesce_densest_as_needed,
            cluster_densest=args.cluster_densest_as_needed,
            drop_smallest=args.drop_smallest_as_needed,
            coalesce_smallest=args.coalesce_smallest_as_needed,
            drop_fraction=args.drop_fraction_as_needed,
            coalesce_fraction=args.coalesce_fraction_as_needed,
            dynamic_drop=args.force_feature_limit,
            drop_by_attribute=args.drop_by_attribute_as_needed,
            drop_by_attribute_descending=args.drop_by_attribute_order == "desc",
            increase_gamma=args.increase_gamma_as_needed,
            gamma=args.gamma,
            cluster_distance=args.cluster_distance,
            cluster_maxzoom=args.cluster_maxzoom,
            keep_point_cluster_position=args.keep_point_cluster_position,
            extend_zooms=args.extend_zooms_if_still_dropping,
            extend_zooms_max=args.extend_zooms_if_still_dropping_maximum,
            limit_tile_feature_count=args.limit_tile_feature_count,
            limit_tile_feature_count_at_maxzoom=(
                args.limit_tile_feature_count_at_maximum_zoom),
            retain_points_multiplier=args.retain_points_multiplier,
            preserve_multiplier_density=(
                args.preserve_multiplier_density_threshold),
            order_by=tuple(args.order_fields),
            preserve_input_order=args.preserve_input_order,
            reverse_lines=args.reverse,
            simplification=args.simplification,
            simplification_at_maxzoom=args.simplification_at_maximum_zoom,
            min_detail=args.minimum_detail,
            tiny_polygon_size=args.tiny_polygon_size,
            generate_label_points=args.convert_polygons_to_label_points,
            drop_lines=args.drop_lines,
            drop_polygons=args.drop_polygons,
            use_source_winding=args.use_source_polygon_winding,
            reverse_source_winding=args.reverse_source_polygon_winding,
            drop_denser=args.drop_denser_vec,
            preserve_point_density=args.preserve_point_density_threshold,
            no_simplify=args.no_line_simplification,
            simplify_only_low=args.simplify_only_low_zooms,
            no_tiny_poly=args.no_tiny_polygon_reduction,
            no_tiny_poly_maxzoom=(
                args.no_tiny_polygon_reduction_at_maximum_zoom),
            no_feature_limit=args.no_feature_limit,
            no_size_limit=args.no_tile_size_limit,
            compress=not args.no_tile_compression,
            visvalingam=args.visvalingam,
            detect_shared_borders=args.detect_shared_borders,
            one_tile=args.one_tile_xy,
        )
        if vec_ds is not None:
            from tippecanoe_ray.pipelines.vector_pyramid import (
                ingest_features_ds,
            )

            feats = ingest_features_ds(vec_ds, vcfg)
        else:
            feats = ingest_features(vec_tbl, vcfg)
        if args.calculate_feature_density:
            # the density scan needs each feature's spatial index
            vec_attrs["__vindex__"] = dict(
                zip(feats["seq"].to_pylist(), feats["vindex"].to_pylist())
            )
        if getattr(args, "calculate_feature_index", False):
            # -aX: append each feature's bbox_index as a
            # tippecanoe:index attribute AFTER its original attrs
            # (serial.cpp:725-732, std::to_string of the uint64).
            # The -y/-x filter loop runs AFTER the append
            # (serial.cpp:850-860), so include-mode (-y implies
            # exclude-all) drops the index unless named, and -x
            # drops it when named
            _inc = set(getattr(args, "include", None) or [])
            _exc = set(getattr(args, "exclude", None) or [])
            _xall = getattr(args, "exclude_all", False) or bool(_inc)
            _keep_ix = (("tippecanoe:index" in _inc) if _xall
                        else ("tippecanoe:index" not in _exc))
            if _keep_ix:
                for s, vix in zip(feats["seq"].to_pylist(),
                                  feats["vindex"].to_pylist()):
                    fid, rows = vec_attrs.get(s, (None, []))
                    vec_attrs[s] = (fid, list(rows) + [
                        ("tippecanoe:index", "double",
                         str(int(vix) & ((1 << 64) - 1)))])
        outs.append(build_vector_pyramid(
            feats, vcfg, attrs=vec_attrs or None,
        ))
    if not outs:
        raise SystemExit("no features found in input")

    # metadata context for the full make_metadata path (bounds/center,
    # vector_layers field types, tilestats) — the reference accumulates
    # this during serialize (serial.cpp:864-911); here the attribute
    # side table is already driver-held, so the layermap accumulates
    # from it in seq order, and the file bboxes reduce over the feature
    # geometry (per-batch partials on the Dataset path)
    from tippecanoe_ray.stages.metadata import (
        accumulate_layermap, file_bboxes_of_features,
    )

    types_of_seq: dict = {}
    if vec_tbl is not None and len(vec_tbl):
        types_of_seq = dict(
            zip(vec_tbl["seq"].to_pylist(), vec_tbl["t"].to_pylist())
        )
    elif vec_ds is not None:
        for r in vec_ds.select_columns(["seq", "t"]).take_all():
            types_of_seq[int(r["seq"])] = int(r["t"])
    if pts_tbl is not None and len(pts_tbl):
        for s in pts_tbl["seq"].to_pylist():
            types_of_seq.setdefault(int(s), 1)
    n_feat_meta = vec_attrs.get("__n__", 0) or (
        max(types_of_seq, default=-1) + 1)
    lmap = accumulate_layermap(
        vec_attrs, types_of_seq, layer, n_feat_meta,
        sample_cap=getattr(args, "tile_stats_sample_values_limit", 1000),
    )
    bb, bb1, bb2 = file_bboxes_of_features(
        vec_tbl=vec_tbl, vec_ds=vec_ds, pts_tbl=pts_tbl)
    args._meta_ctx = {
        "lmap": lmap,
        "bboxes": (bb, bb1, bb2),
        "minzoom": cfg.minzoom,
        "maxzoom": cfg.maxzoom,
        "basezoom": (args.basezoom if isinstance(args.basezoom, int)
                     and args.basezoom >= 0 else None),
        "droprate": cfg.droprate,
        "multiplier": getattr(args, "retain_points_multiplier", 1) or 1,
    }
    if len(outs) == 1:
        return outs[0]
    return merge_tilesets(*outs)


def _truncate_utf8(s: str, max_bytes: int) -> str:
    """truncate_string (text.cpp:329-344): cut the UTF-8 byte string at
    max_bytes, backing off to the initial byte of a code point."""
    b = s.encode("utf-8")
    if len(b) <= max_bytes:
        return s
    i = max_bytes
    while i > 0 and not ((b[i] & 0x80) == 0 or (b[i] & 0xC0) == 0xC0):
        i -= 1
    return b[:i].decode("utf-8", errors="ignore")


def _strtoull_id(s: str, exact: bool) -> int | None:
    """C strtoull(s, &err, 10) + the round-trip id checks: None unless
    the whole string parses and to_string(value) equals the input
    (exact, geojson.cpp:155) or the input with leading zeros stripped
    (strip_zeroes, serial.cpp:381-390)."""
    import re

    mm = re.match(r"[ \t\r\n]*[+-]?[0-9]+", s)
    if mm is None or mm.end() != len(s):
        return None  # "non-integer feature ID" warning in the reference
    body = mm.group(0).lstrip()
    neg = body.startswith("-")
    mag = int(body.lstrip("+-"))
    if mag >= (1 << 64):
        val = (1 << 64) - 1  # strtoull ERANGE clamp
    elif neg:
        val = (-mag) % (1 << 64)
    else:
        val = mag
    ref = s if exact else s.lstrip("0")
    return val if str(val) == ref else None


def _parse_accum(specs: list[str]) -> tuple:
    """-E name:op, or a JSON object {"name": "op", ...}
    (set_attribute_accum, attribute.cpp:43-90)."""
    import json as _json

    out = []
    for s in specs:
        if s.startswith("{"):
            for k, v in _json.loads(s).items():
                out.append((k, v))
        else:
            out.append(tuple(s.split(":", 1)))
    return tuple(out)


def tilejoin_main(argv):
    """`python -m tippecanoe_ray tilejoin` — the reference's tile-join
    surface (tile-join.cpp): CSV attribute join, N-way tileset merge,
    layer keep/remove/rename, attribute exclude, zoom subset. Output
    tiles are byte-identical to the reference binary's
    (tests/test_tilejoin_reference.py)."""
    ap = argparse.ArgumentParser(prog="tippecanoe_ray tilejoin")
    ap.add_argument("inputs", nargs="*",
                    help="input .mbtiles/.pmtiles tilesets or dirtiles dirs")
    ap.add_argument("-o", "--output", default=None, help="output .mbtiles")
    ap.add_argument("-e", "--output-to-directory", default=None,
                    help="output z/x/y.pbf directory")
    ap.add_argument("-c", "--csv", default=None, help="CSV to join on the first column")
    ap.add_argument("-x", "--exclude", action="append", default=[],
                    help="exclude this attribute")
    ap.add_argument("-X", "--exclude-all", action="store_true")
    ap.add_argument("-y", "--include", action="append", default=[],
                    help="keep only this attribute (overrides -X)")
    ap.add_argument("-i", "--if-matched", action="store_true",
                    help="keep only features with a CSV match")
    ap.add_argument("--empty-csv-columns-are-null", action="store_true")
    ap.add_argument("-l", "--layer", action="append", default=[],
                    help="keep only this layer")
    ap.add_argument("-L", "--exclude-layer", action="append", default=[],
                    help="remove this layer")
    ap.add_argument("-R", "--rename-layer", action="append", default=[],
                    help="old:new layer rename")
    ap.add_argument("-Z", "--minimum-zoom", type=int, default=None)
    ap.add_argument("-z", "--maximum-zoom", type=int, default=None)
    ap.add_argument("-n", "--name", default=None)
    ap.add_argument("-N", "--description", default=None)
    ap.add_argument("-A", "--attribution", default=None)
    ap.add_argument("--no-tile-stats", action="store_true")
    ap.add_argument("--tile-stats-attributes-limit", type=int, default=None)
    ap.add_argument("--tile-stats-sample-values-limit", type=int, default=None)
    ap.add_argument("--tile-stats-values-limit", type=int, default=None)
    ap.add_argument("-j", "--feature-filter", default=None,
                    help="JSON feature-filter expression")
    ap.add_argument("-J", "--feature-filter-file", default=None)
    ap.add_argument("--exclude-all-tile-attributes", action="store_true",
                    help="strip every attribute, joined columns "
                         "included (tile-join.cpp:216,289)")
    ap.add_argument("--exclude-all-tile-geometries", action="store_true",
                    help="strip every geometry, keeping attributes "
                         "(tile-join.cpp:328; features serialize with "
                         "no type/geometry fields)")
    ap.add_argument("-O", "--overzoom", action="store_true",
                    help="overzoom shallower inputs up to the deepest "
                         "input's maxzoom (tile-join.cpp:1402)")
    ap.add_argument("-b", "--buffer", type=int, default=5,
                    help="overzoom clip buffer in 256ths "
                         "(tile-join.cpp:64)")
    ap.add_argument("-pC", "--no-tile-compression", action="store_true",
                    dest="no_tile_compression")
    ap.add_argument("-pk", "--no-tile-size-limit", action="store_true",
                    dest="no_tile_size_limit")
    ap.add_argument("-r", "--read-from", default=None,
                    help="file listing input tilesets, one per line")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    started_here = not ray.is_initialized()
    if started_here:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    from tippecanoe_ray.pipelines.tilejoin import (
        gather_input_metadata,
        merge_tilesets_exact,
        reduce_join_stats,
        tilejoin_metadata,
    )
    from tippecanoe_ray.sources.mbtiles import read_mbtiles, write_mbtiles

    import os as _os

    if not args.output and not args.output_to_directory:
        ap.error("one of -o/--output or -e/--output-to-directory is required")
    if args.read_from:  # -r: input list file (tile-join.cpp:1500-1510)
        with open(args.read_from, encoding="utf-8") as f:
            args.inputs = args.inputs + [
                line.strip() for line in f if line.strip()]
    if not args.inputs:
        ap.error("no input tilesets")
    from tippecanoe_ray.sources.dirtiles import read_dirtiles, write_dirtiles
    from tippecanoe_ray.sources.pmtiles import read_pmtiles, write_pmtiles

    def read_any(p):
        if _os.path.isdir(p):
            return read_dirtiles(p)
        if p.endswith(".pmtiles"):
            return read_pmtiles(p)
        return read_mbtiles(p)

    dss = [read_any(p) for p in args.inputs]
    # zoom subset happens at the reader (tile-join.cpp -Z/-z), so the
    # skipped tiles never reach the metadata accumulation either
    if args.minimum_zoom is not None:
        dss = [d.filter(expr=f"z >= {args.minimum_zoom}") for d in dss]
    if args.maximum_zoom is not None:
        dss = [d.filter(expr=f"z <= {args.maximum_zoom}") for d in dss]
    renames = dict(r.split(":", 1) for r in args.rename_layer) or None
    feature_filter = None
    fdoc = args.feature_filter
    if args.feature_filter_file:
        with open(args.feature_filter_file, encoding="utf-8") as f:
            fdoc = f.read()
    if fdoc:
        from tippecanoe_ray.functions.filters import compile_filter

        feature_filter = compile_filter(json.loads(fdoc))
    overzoom_final_keys = None
    if args.overzoom:
        # -O (tile-join.cpp:1402-1404): overzoom the shallower inputs
        # up to the deepest input's real maxzoom — entire levels, each
        # overzoomed tile built from its maxzoom ancestor. The readers'
        # final queue states (minimum next-level candidate) order the
        # metadata accumulation.
        from tippecanoe_ray.pipelines.overzoom_exact import (
            overzoom_extend_ds, overzoom_final_key,
        )

        zmaxes = []
        for d in dss:
            try:
                zmaxes.append(d.max("z"))
            except Exception:
                zmaxes.append(None)
        real = [z for z in zmaxes if z is not None]
        if real:
            target = int(max(real))
            overzoom_final_keys = {}
            new_dss = []
            for path, d, zm in zip(args.inputs, dss, zmaxes):
                if zm is None:
                    overzoom_final_keys[path] = (1 << 30, 0, 0, b"")
                    new_dss.append(d)
                    continue
                if int(zm) >= target:
                    overzoom_final_keys[path] = overzoom_final_key(
                        d, int(zm), target, buffer=args.buffer)
                    new_dss.append(d)
                    continue
                ext = overzoom_extend_ds(d, target, buffer=args.buffer)
                if ext is None:
                    overzoom_final_keys[path] = (1 << 30, 0, 0, b"")
                    new_dss.append(d)
                    continue
                ext = ext.materialize()
                frontier = (ext.filter(expr="z < 0")
                            .select_columns(["x", "y"]).to_pandas())
                gen_target = (ext.filter(expr=f"z == {target}")
                              .to_pandas())
                overzoom_final_keys[path] = overzoom_final_key(
                    d, int(zm), target, frontier=frontier,
                    gen_target_rows=gen_target, buffer=args.buffer)
                new_dss.append(d.union(ext.filter(expr="z >= 0")))
            dss = new_dss
    merged = merge_tilesets_exact(
        dss, csv_path=args.csv, exclude=frozenset(args.exclude),
        # -y implies exclude-all (tile-join.cpp:1475-1478)
        exclude_all=args.exclude_all or bool(args.include),
        semi=args.if_matched,
        empty_null=args.empty_csv_columns_are_null,
        keep_layers=frozenset(args.layer),
        remove_layers=frozenset(args.exclude_layer), renames=renames,
        with_stats=True, feature_filter=feature_filter,
        compress=not args.no_tile_compression,
        include=frozenset(args.include),
        no_size_limit=args.no_tile_size_limit,
        exclude_all_tile_attrs=args.exclude_all_tile_attributes,
        exclude_all_tile_geoms=args.exclude_all_tile_geometries,
    ).materialize()
    stats_rows = reduce_join_stats(merged)
    inputs_meta = gather_input_metadata(
        args.inputs, args.minimum_zoom, args.maximum_zoom,
        final_keys=overzoom_final_keys)
    meta = tilejoin_metadata(
        stats_rows, inputs_meta,
        commandline="tippecanoe_ray tilejoin " + " ".join(argv),
        set_name=args.name, set_description=args.description,
        set_attribution=args.attribution,
        no_tilestats=args.no_tile_stats,
        tilestats_attributes_limit=args.tile_stats_attributes_limit,
        tilestats_sample_values_limit=args.tile_stats_sample_values_limit,
        tilestats_values_limit=args.tile_stats_values_limit,
        sentinel_bounds=args.exclude_all_tile_geometries,
    )
    if args.output_to_directory:
        n = write_dirtiles(merged, args.output_to_directory, meta=meta)
        out_path = args.output_to_directory
    elif args.output and args.output.endswith(".pmtiles"):
        if _os.path.exists(args.output):
            _os.unlink(args.output)
        n = write_pmtiles(
            merged, args.output, meta=meta,
            compressed_tiles=not args.no_tile_compression)
        out_path = args.output
    else:
        if _os.path.exists(args.output):  # tile-join -f semantics
            _os.unlink(args.output)
        n = write_mbtiles(merged, args.output, meta_fn=lambda *_: meta)
        out_path = args.output
    print(json.dumps({"output": out_path, "n_tiles": int(n),
                      "elapsed_sec": round(time.time() - t0, 2)}))
    if started_here:
        ray.shutdown()
    return 0


def decode_main(argv):
    """`python -m tippecanoe_ray decode` — tippecanoe-decode with
    byte-identical text output (stages/decode_json.py; verified in
    tests/test_decode_reference.py). Pure local I/O, no Ray session."""
    ap = argparse.ArgumentParser(prog="tippecanoe_ray decode")
    ap.add_argument("tileset", help=".mbtiles file or dirtiles directory")
    ap.add_argument("zxy", nargs="*", type=int,
                    help="optional: z x y of a single tile")
    ap.add_argument("-Z", "--minimum-zoom", type=int, default=0)
    ap.add_argument("-z", "--maximum-zoom", type=int, default=32)
    ap.add_argument("-l", "--layer", action="append", default=[])
    ap.add_argument("-x", "--exclude-metadata-row", action="append",
                    default=[])
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--integer", action="store_true")
    ap.add_argument("--fraction", action="store_true")
    ap.add_argument("-c", "--tag-layer-and-zoom", action="store_true",
                    help="pipeline form: bare features with the "
                         "tippecanoe envelope")
    ap.add_argument("-s", "--projection", default="EPSG:4326",
                    choices=["EPSG:4326", "EPSG:3857"],
                    help="output coordinate system (decode.cpp:560)")
    args = ap.parse_args(argv)
    from tippecanoe_ray.stages.decode_json import decode_to_text

    mode = 2 if args.integer else 1 if args.fraction else 0
    one = tuple(args.zxy) if len(args.zxy) == 3 else None
    sys.stdout.write(decode_to_text(
        args.tileset, minzoom=args.minimum_zoom, maxzoom=args.maximum_zoom,
        to_decode=frozenset(args.layer),
        exclude_meta=frozenset(args.exclude_metadata_row),
        stats=args.stats, coordinate_mode=mode, one_tile=one,
        pipeline=args.tag_layer_and_zoom, projection=args.projection))
    return 0


def enumerate_main(argv):
    """`python -m tippecanoe_ray enumerate` — tippecanoe-enumerate:
    one `file z x y` line per tile in z/x/tms-row order
    (enumerate.cpp:24-44)."""
    for fname in argv:
        import sqlite3 as _sq

        con = _sq.connect("file:" + fname + "?mode=ro", uri=True)
        for z, x, ty in con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles "
            "ORDER BY zoom_level, tile_column, tile_row"
        ):
            sys.stdout.write(
                f"{fname} {int(z)} {int(x)} {(1 << int(z)) - 1 - int(ty)}\n")
        con.close()
    return 0


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "tilejoin":
        return tilejoin_main(argv[1:])
    if argv and argv[0] == "decode":
        return decode_main(argv[1:])
    if argv and argv[0] == "enumerate":
        return enumerate_main(argv[1:])
    if argv and argv[0] == "jsontool":
        from tippecanoe_ray.pipelines.jsontool import jsontool_main

        return jsontool_main(argv[1:])
    if argv and argv[0] == "overzoom":
        from tippecanoe_ray.pipelines.overzoom_exact import overzoom_main

        return overzoom_main(argv[1:])
    ap = argparse.ArgumentParser(prog="tippecanoe_ray")
    ap.add_argument("--input", default=[], action="append",
                    help="parquet/lance feature table, or .geojson/.json[.gz], "
                         ".geobuf, .csv (geocsv points)")
    ap.add_argument("--layer-name", default=None)
    ap.add_argument("--named-layer", "-L", action="append", default=[],
                    help="name:file — read file into layer `name` "
                         "(-L, may repeat; main.cpp multi-source "
                         "layer map); the file is added to the inputs")
    ap.add_argument("--buffer", type=int, default=5,
                    help="tile buffer in 256ths (lines/polygons)")
    ap.add_argument("--max-tile-bytes", type=int, default=None,
                    help="compressed byte cap with detail ladder (reference -M 500000)")
    ap.add_argument("--out", required=True, help="output tileset directory")
    ap.add_argument("--id-col", default="image_id")
    ap.add_argument("--rule", default="fnv", choices=["fnv", "lcg"])
    ap.add_argument("--minzoom", type=int, default=0)
    ap.add_argument("--maxzoom", default="14",
                    help="maximum zoom, or 'g' to guess from feature "
                         "spacing (-zg, main.cpp:2279-2470)")
    ap.add_argument("--basezoom", default=None,
                    help="zoom from which the rate ladder drops, or "
                         "'g'/'g<width>'/'f<count>' to guess from the "
                         "densest tile (-Bg/-Bf, main.cpp:3416-3432)")
    ap.add_argument("--droprate", default="2.5",
                    help="rate ladder base; 'p' fits it from the spacing "
                         "spread (-rp), 'g'/'g<width>'/'f<count>' from "
                         "the densest tile (-rg/-rf, main.cpp:3535-3553)")
    ap.add_argument("--gamma", type=float, default=0.0)
    ap.add_argument("--cluster-distance", type=int, default=0)
    ap.add_argument("--drop-densest", action="store_true")
    # as-needed strategies in the vector pipeline (tile.cpp:1993-2144 +
    # the whole-zoom threshold consensus, tile.cpp:3392-3572)
    ap.add_argument("--drop-densest-as-needed", action="store_true")
    ap.add_argument("--coalesce-densest-as-needed", action="store_true")
    ap.add_argument("--cluster-densest-as-needed", action="store_true")
    ap.add_argument("--drop-smallest-as-needed", action="store_true")
    ap.add_argument("--coalesce-smallest-as-needed", action="store_true")
    ap.add_argument("--drop-fraction-as-needed", action="store_true")
    ap.add_argument("--coalesce-fraction-as-needed", action="store_true")
    ap.add_argument("--force-feature-limit", action="store_true",
                    help="-pd: per-tile drop-fraction thresholds only")
    ap.add_argument("--drop-by-attribute-as-needed", default=None,
                    help="attribute name to drop by when tiles overflow")
    ap.add_argument("--drop-by-attribute-order", default="asc",
                    choices=["asc", "desc"])
    ap.add_argument("--increase-gamma-as-needed", action="store_true")
    ap.add_argument("--cluster-maxzoom", "-k", default="24",
                    help="deepest zoom that clusters, or 'g' to stop "
                         "clustering one zoom before maxzoom (-kg, "
                         "main.cpp:3447-3452,2485-2488)")
    ap.add_argument("--keep-point-cluster-position", action="store_true")
    ap.add_argument("--extend-zooms-if-still-dropping", action="store_true",
                    help="-ae: grow maxzoom while the deepest zoom is "
                         "still raising drop thresholds")
    ap.add_argument("--extend-zooms-if-still-dropping-maximum", type=int,
                    default=0, help="bounded -ae (main.cpp:91)")
    ap.add_argument("--limit-tile-feature-count", type=int, default=0,
                    help="hard per-layer truncation after ordering "
                         "(tile.cpp:2595-2611)")
    ap.add_argument("--limit-tile-feature-count-at-maximum-zoom", type=int,
                    default=0)
    ap.add_argument("--retain-points-multiplier", "-m", type=int, default=1,
                    help="keep rate-dropped features as secondary "
                         "multiplier-cluster members (tile.cpp:1290-1319)")
    ap.add_argument("--preserve-multiplier-density-threshold", type=int,
                    default=0)
    # per-tile orderings (tile.cpp:2583-2593); repeatable, keys compared
    # in COMMAND-LINE order across all four spellings (the reference
    # appends to one order_by vector, main.cpp:3293-3303)
    class _OrderAction(argparse.Action):
        def __call__(self, parser, ns, values, option_string=None):
            lst = getattr(ns, "order_fields", None) or []
            desc = option_string in ("--order-descending-by",
                                     "--order-largest-first")
            name = ":size" if option_string in (
                "--order-smallest-first", "--order-largest-first") else values
            lst.append((name, desc))
            ns.order_fields = lst

    ap.add_argument("--order-by", action=_OrderAction)
    ap.add_argument("--order-descending-by", action=_OrderAction)
    ap.add_argument("--order-smallest-first", action=_OrderAction, nargs=0)
    ap.add_argument("--order-largest-first", action=_OrderAction, nargs=0)
    ap.set_defaults(order_fields=[])
    ap.add_argument("--preserve-input-order", "-pi", action="store_true")
    ap.add_argument("--smallest-maximum-zoom-guess", type=int, default=None,
                    help="-zg with a floor (main.cpp:3275-3282)")
    ap.add_argument("--simplification", "-S", type=float, default=1.0)
    ap.add_argument("--simplification-at-maximum-zoom", type=float,
                    default=-1.0)
    ap.add_argument("--maximum-string-attribute-length", type=int, default=0)
    ap.add_argument("--exclude", "-x", action="append", default=[],
                    help="drop the named attribute everywhere")
    ap.add_argument("--exclude-all", "-X", action="store_true")
    ap.add_argument("--minimum-detail", type=int, default=7)
    ap.add_argument("--tiny-polygon-size", type=int, default=2)
    ap.add_argument("--convert-polygons-to-label-points", action="store_true")
    ap.add_argument("--drop-lines", action="store_true")
    ap.add_argument("--drop-polygons", action="store_true")
    ap.add_argument("--use-attribute-for-id", default=None)
    ap.add_argument("--convert-stringified-ids-to-numbers",
                    dest="convert_stringified_ids", action="store_true")
    ap.add_argument("--generate-ids", action="store_true")
    ap.add_argument("--reverse", action="store_true",
                    help="-ar: reverse lines that run up-and-left so "
                         "they coalesce better (tile.cpp:657-660)")
    ap.add_argument("--no-line-simplification", action="store_true")
    ap.add_argument("--visvalingam", action="store_true",
                    help="-av: simplify by effective triangle area "
                         "(visvalingam.cpp:147-230) instead of "
                         "Douglas-Peucker")
    ap.add_argument("--calculate-feature-index", action="store_true",
                    help="-aX: add each feature's spatial index as a "
                         "tippecanoe:index attribute (serial.cpp:725)")
    ap.add_argument("--detect-shared-borders", action="store_true",
                    help="-ab: simplify shared polygon borders "
                         "identically via a per-tile arc pass "
                         "(shared_borders.cpp:86)")
    ap.add_argument("--one-tile", "-R", default=None, metavar="Z/X/Y",
                    help="produce only tile z/x/y: minzoom and maxzoom "
                         "both become z (main.cpp:3402-3414)")
    ap.add_argument("--use-source-polygon-winding", action="store_true")
    ap.add_argument("--reverse-source-polygon-winding", action="store_true")
    ap.add_argument("--drop-denser", dest="drop_denser_vec", type=int,
                    default=0, help="drop this percentage of features by "
                    "spacing-gap rank instead of the ladder (main.cpp:2692)")
    ap.add_argument("--preserve-point-density-threshold", type=int, default=0)
    ap.add_argument("--simplify-only-low-zooms", action="store_true")
    ap.add_argument("--no-tiny-polygon-reduction", action="store_true")
    ap.add_argument("--no-tiny-polygon-reduction-at-maximum-zoom",
                    action="store_true")
    ap.add_argument("--no-feature-limit", action="store_true")
    ap.add_argument("--no-tile-size-limit", action="store_true")
    ap.add_argument("--no-tile-compression", action="store_true")
    ap.add_argument("--empty-csv-columns-are-null", action="store_true",
                    help="-pe: empty geocsv columns become null attrs "
                         "(geocsv.cpp:103-106)")
    ap.add_argument("--name", dest="ts_name", default=None,
                    help="-n: tileset name in the metadata")
    ap.add_argument("--description", default=None,
                    help="-N: tileset description (defaults to the "
                         "mbtiles filename)")
    ap.add_argument("--attribution", default=None,
                    help="-A: attribution metadata")
    ap.add_argument("--no-tile-stats", action="store_true")
    ap.add_argument("--tile-stats-attributes-limit", type=int, default=1000)
    ap.add_argument("--tile-stats-sample-values-limit", type=int, default=1000)
    ap.add_argument("--tile-stats-values-limit", type=int, default=100)
    ap.add_argument("--limit-base-zoom-to-maximum-zoom", action="store_true",
                    help="-pb (main.cpp:2585-2588)")
    ap.add_argument("--max-tile-features", type=int, default=None,
                    help="as-needed drop limit per tile (reference -O, default 200000)")
    ap.add_argument("--clip-bounding-box", action="append", default=[],
                    help="minlon,minlat,maxlon,maxlat — clip every "
                         "feature at read time (may repeat)")
    ap.add_argument("--prefilter", "-C", default=None,
                    help="per-tile shell prefilter over NDJSON GeoJSON "
                         "(-C, plugin.cpp:376-470)")
    ap.add_argument("--postfilter", "-c", default=None,
                    help="per-tile shell postfilter over the assembled "
                         "tile's GeoJSON (-c, plugin.cpp:378-418)")
    ap.add_argument("--generate-variable-depth-tile-pyramid", "-at",
                    dest="variable_depth", action="store_true",
                    help="leaf the pyramid early where a full-precision "
                         "tile fits (-at, tile.cpp:1701-1713)")
    ap.add_argument("--prevent-shared-nodes", "-pn", action="store_true",
                    help="preserve shared vertices through simplification "
                         "(-pn, main.cpp:2015-2169)")
    ap.add_argument("--detect-longitude-wraparound", "-aw",
                    dest="detect_wraparound", action="store_true",
                    help="repair >180-degree longitude jumps between "
                         "consecutive vertices (-aw, serial.cpp:313-337)")
    ap.add_argument("--include", "-y", action="append", default=[],
                    help="keep ONLY these attributes (-y, may repeat; "
                         "main.cpp include set)")
    ap.add_argument("--feature-filter", "-j", default=None,
                    help="feature filter JSON expression or {layer: "
                         "expr} hash (-j, evaluator.cpp)")
    ap.add_argument("--feature-filter-file", "-J", default=None,
                    help="read the feature filter from this file (-J)")
    ap.add_argument("--attribute-type", "-T", action="append", default=[],
                    help="name:type coercion (-T, may repeat; "
                         "coerce_value serial.cpp:924-958)")
    ap.add_argument("--single-precision", action="store_true",
                    help="-pN: re-round float attributes through "
                         "float32 (serial.cpp:804-811)")
    ap.add_argument("--grid-low-zooms", action="store_true",
                    help="rasterize low-zoom geometry onto the pixel "
                         "grid (geometry.cpp:438-544)")
    ap.add_argument("--extra-detail", type=int, default=None,
                    help="re-encode maxzoom tiles at this detail "
                         "(tile.cpp:2265-2285)")
    ap.add_argument("--full-detail", "-d", type=int, default=None,
                    help="tile detail at maxzoom (default 12)")
    ap.add_argument("--low-detail", "-D", type=int, default=None,
                    help="tile detail below maxzoom (default 12)")
    ap.add_argument("--reorder", "-ao", action="store_true",
                    help="sort each tile's features by attributes "
                         "(tile.cpp:2518-2521)")
    ap.add_argument("--coalesce", "-ac", action="store_true",
                    help="merge adjacent identical-attribute features "
                         "into one multigeometry (tile.cpp:2524-2546)")
    ap.add_argument("--calculate-feature-density", action="store_true",
                    help="-ag: tag each feature with its density "
                         "(0-255, tile.cpp:2146-2157)")
    ap.add_argument("--hilbert", action="store_true",
                    help="hilbert spatial indexes instead of quadkey "
                         "(main.cpp:3680-3687)")
    ap.add_argument("--no-clipping", dest="prevent_clipping",
                    action="store_true",
                    help="-pc: don't clip geometry to tile boundaries "
                         "(tile.cpp:1045-1050)")
    ap.add_argument("--no-duplication", dest="prevent_duplication",
                    action="store_true",
                    help="-pD: emit each feature only in the tile "
                         "holding its bbox midpoint (tile.cpp:1039-1044)")
    ap.add_argument("--projection", "-s", default="EPSG:4326",
                    choices=["EPSG:4326", "EPSG:3857"],
                    help="input coordinate system (projection.cpp:13-17)")
    ap.add_argument("--fragment-bytes", type=int, default=8 << 20,
                    help="target byte size of the parallel-ingest "
                         "fragments for NDJSON inputs (the reference's "
                         "-P split, main.cpp:451-540); inputs smaller "
                         "than two fragments read serially")
    ap.add_argument("--set-attribute", action="append", default=[],
                    help="name:value or a JSON object — set the "
                         "attribute on every feature (replaces an "
                         "existing value in place, appends new keys; "
                         "main.cpp:2885-2936, serial.cpp:785-799)")
    ap.add_argument("--accumulate-attribute", "-E", action="append",
                    default=[],
                    help="key:op — fold this attribute of rate-dropped "
                         "features onto the kept feature (op: sum, "
                         "product, mean, max, min, concat, comma, "
                         "count; attribute.cpp:16-56)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--mbtiles", default=None, help="also package to this mbtiles file")
    ap.add_argument("--pmtiles", default=None, help="also package to this pmtiles archive")
    ap.add_argument("--dirtiles", default=None, help="also write z/x/y.pbf dirtiles here")
    ap.add_argument("--force", "-f", action="store_true",
                    help="delete existing tileset outputs first "
                         "(main.cpp -f; without it an existing output "
                         "is an error)")
    ap.add_argument("--allow-existing", "-F", action="store_true",
                    help="write into an existing tileset output "
                         "(main.cpp -F)")
    args = ap.parse_args(argv)
    args.named_layers = {}
    for spec in args.named_layer:
        name, _, path = spec.partition(":")
        args.named_layers[path] = name
        args.input.append(path)
    if not args.input:
        ap.error("--input (or -L name:file) is required")
    import os as _os

    for _target in (args.mbtiles, args.pmtiles):
        if _target and _os.path.exists(_target):
            if args.force:
                _os.remove(_target)
            elif not args.allow_existing:
                # mbtiles.cpp:50-60 / pmtiles: existing output without
                # -f/-F is a hard error (tests/allow-existing)
                raise SystemExit(
                    f"{_target}: file exists; use --force to overwrite "
                    "or --allow-existing to add to it")
    args.guess_zoom = (str(args.maxzoom) == "g"
                       or args.smallest_maximum_zoom_guess is not None)
    if args.smallest_maximum_zoom_guess is not None:
        args.maxzoom = "g"
    # the reference guesses from a provisional MAX_ZOOM (main.cpp:3391)
    args.maxzoom = 24 if args.guess_zoom else int(args.maxzoom)
    args.one_tile_xy = None
    if args.one_tile:
        # -R z/x/y (main.cpp:3402-3414): minzoom = maxzoom = z
        parts = args.one_tile.split("/")
        if len(parts) != 3:
            raise SystemExit("--one-tile argument must be z/x/y")
        _otz, _otx, _oty = (int(v) for v in parts)
        args.minzoom = args.maxzoom = _otz
        args.guess_zoom = False
        args.one_tile_xy = (_otx, _oty)
    # -B / -r guess forms (main.cpp:3416-3432,3535-3553): sentinel -1 =
    # unspecified, -2 = guess from the densest tile; 'g<width>' sets the
    # marker width directly, 'f<count>' via sqrt(50000/count)
    import math as _math

    args.basezoom_marker_width = 1.0
    b = args.basezoom
    if b is None:
        args.basezoom = -1
    elif str(b) == "g":
        args.basezoom = -2
    elif str(b)[0] in "gf":
        args.basezoom = -2
        v = float(str(b)[1:])
        args.basezoom_marker_width = (
            v if str(b)[0] == "g" else _math.sqrt(50000 / v))
    else:
        args.basezoom = int(b)
    d = str(args.droprate)
    if d == "g":
        args.droprate = -2.0
    elif d == "p":
        args.droprate = -3.0
    elif d[0] in "gf":
        args.droprate = -2.0
        v = float(d[1:])
        args.basezoom_marker_width = (
            v if d[0] == "g" else _math.sqrt(50000 / v))
    else:
        args.droprate = float(d)
    args.guess_cluster_maxzoom = str(args.cluster_maxzoom) == "g"
    # -kg: provisional MAX_ZOOM-1 until the real maxzoom is known
    args.cluster_maxzoom = (23 if args.guess_cluster_maxzoom
                            else int(args.cluster_maxzoom))
    if args.basezoom == -1 and not args.guess_zoom:
        # unspecified basezoom = maxzoom (main.cpp:3758-3762); only -zg
        # defers the decision
        args.basezoom = args.maxzoom if args.maxzoom <= 24 else 24
    if args.maxzoom > 24:
        # "Highest supported zoom is -z24" (MAX_ZOOM, main.hpp:77,
        # clamp main.cpp:3723-3725)
        print("Highest supported zoom is -z24", file=sys.stderr)
        args.maxzoom = 24

    import ray

    started_here = False
    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
        started_here = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from tippecanoe_ray.pipelines.pyramid import PyramidConfig, build_pyramid
    from tippecanoe_ray.sources.image_table import read_image_table
    from tippecanoe_ray.stages.strategies import StrategyConfig
    from tippecanoe_ray.state.lineage import run_metrics

    scfg = None
    if args.gamma or args.cluster_distance or args.drop_densest:
        kw = dict(
            gamma=args.gamma,
            cluster_distance=args.cluster_distance,
            drop_densest=args.drop_densest,
        )
        if args.max_tile_features:
            kw["max_tile_features"] = args.max_tile_features
        scfg = StrategyConfig(**kw)
    cfg = PyramidConfig(
        minzoom=args.minzoom,
        maxzoom=args.maxzoom,
        basezoom=None if args.basezoom < 0 else args.basezoom,
        droprate=args.droprate,
        id_col=args.id_col,
        rule=args.rule,
        seq_col=None,  # derive a deterministic sequence from the id
        strategies=scfg,
    )
    t0 = time.time()
    lower = args.input[0].lower()
    # anything that isn't a parquet/lance table is a geometry source
    # (the reference sniffs content; extensionless geojson is common,
    # e.g. tests/named/alg)
    geoish = not (lower.endswith((".parquet", ".lance"))
                  or _os.path.isdir(args.input[0]))
    if geoish:
        tiles = _build_from_geo(args, cfg)
    else:
        ds = read_image_table(args.input[0])
        tiles = build_pyramid(ds, cfg, out_dir=args.out, resume=args.resume)
    n_tiles = tiles.count()
    out = {
        "out_dir": args.out,
        "n_tiles": n_tiles,
        "elapsed_sec": round(time.time() - t0, 2),
    }
    try:
        out["metrics"] = run_metrics(args.out)
    except FileNotFoundError:
        # geo inputs build in-memory tilesets (no resumable raw layout)
        out["metrics"] = None
    if args.mbtiles:
        from tippecanoe_ray.sources.mbtiles import write_mbtiles

        strategies = None
        try:
            cols = tiles.schema().names
        except Exception:
            cols = []
        import json as _json
        import os as _os

        point_counters = {}
        sj = _os.path.join(args.out, "strategies.json")
        if _os.path.exists(sj):
            with open(sj) as f:
                point_counters = {int(k): v for k, v in _json.load(f).items()}
        if "s_rate" in cols or point_counters:
            from tippecanoe_ray.stages.strategies import strategies_from_tile_table

            strategies = strategies_from_tile_table(
                tiles.select_columns(
                    [c for c in ("z", "s_rate", "s_tiny", "s_detail",
                                 "s_tsize", "s_fcount", "s_gamma",
                                 "s_need_d", "s_need_c", "leafed")
                     if c in cols]
                ).to_pandas() if "s_rate" in cols else None,
                cfg.maxzoom,
            )
            for z_, cnts in point_counters.items():
                if 0 <= z_ <= cfg.maxzoom:
                    for k_, v_ in cnts.items():
                        strategies[z_][k_] = strategies[z_].get(k_, 0) + v_
        meta_ctx = getattr(args, "_meta_ctx", None)
        if meta_ctx is not None:
            import sys as _sys

            from tippecanoe_ray.stages.metadata import (
                bounds_and_center, make_metadata,
            )
            from tippecanoe_ray.stages.strategies import stringify_strategies

            sj = (stringify_strategies(strategies)
                  if strategies is not None and any(strategies) else "")
            bb, bb1, bb2 = meta_ctx["bboxes"]

            def meta_fn(midx, midy, zmin_seen, zmax_seen,
                        _ctx=meta_ctx, _sj=sj):
                mz = max(_ctx["maxzoom"], zmax_seen)
                bc = bounds_and_center(bb, bb1, bb2, midx, midy, mz)
                return make_metadata(
                    getattr(args, "ts_name", None) or args.mbtiles,
                    _ctx["minzoom"], mz, bc, _ctx["lmap"],
                    description=getattr(args, "description", None),
                    attribution=getattr(args, "attribution", None),
                    strategies_json=_sj,
                    generator_options=" ".join(_sys.argv[1:]),
                    do_tilestats=not getattr(args, "no_tile_stats", False),
                    basezoom=_ctx["basezoom"],
                    droprate=_ctx["droprate"],
                    retain_points_multiplier=_ctx["multiplier"],
                    elements=getattr(args, "tile_stats_values_limit", 100),
                    attributes_cap=getattr(
                        args, "tile_stats_attributes_limit", 1000),
                    sample_cap=getattr(
                        args, "tile_stats_sample_values_limit", 1000),
                )

            out["mbtiles_tiles"] = write_mbtiles(
                tiles, args.mbtiles, minzoom=cfg.minzoom,
                maxzoom=cfg.maxzoom, layer_name=cfg.layer_name,
                meta_fn=meta_fn,
            )
        else:
            out["mbtiles_tiles"] = write_mbtiles(
                tiles, args.mbtiles, minzoom=cfg.minzoom, maxzoom=cfg.maxzoom,
                layer_name=cfg.layer_name, strategies=strategies,
            )
    if args.pmtiles:
        from tippecanoe_ray.sources.pmtiles import write_pmtiles

        out["pmtiles_entries"] = write_pmtiles(
            tiles, args.pmtiles, minzoom=cfg.minzoom, maxzoom=cfg.maxzoom,
            layer_name=cfg.layer_name,
        )
    if args.dirtiles:
        from tippecanoe_ray.sources.dirtiles import write_dirtiles

        out["dirtiles_tiles"] = write_dirtiles(
            tiles, args.dirtiles, layer_name=cfg.layer_name,
            minzoom=cfg.minzoom, maxzoom=cfg.maxzoom,
        )
    print(json.dumps(out))
    if started_here:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
