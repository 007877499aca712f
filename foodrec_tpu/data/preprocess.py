# coding: utf-8
"""Offline data pipeline (SURVEY.md §2.8): programmatic, tested equivalents
of the reference's dataset_process notebooks
(dataset_process/{foodcom,allrecipes}_process.ipynb and *_kmeans.ipynb).

Stages, each a composable function over dataframes/arrays:

  * iterative k-core interaction filtering            (foodcom cell 0)
  * temporal 60/10/30 split keeping users in train∩test (cell 2)
  * sorted-classes id re-encoding                     (cell 3)
  * tab-separated .rating files                       (cell 5)
  * ingredient id filtering + padded code matrix + ri_graph (cells 7-8)
  * popularity^0.7-biased 500-negative eval files, seed 2024 (cell 18)
  * train COO pickle, ur graph                        (cells 24-26)
  * calorie levels int(cal/50) label-encoded -> rc_graph + dict (cell 28)
  * WHO-style 6-criterion health score -> rh_graph + scalar/multi-hot dicts
    + nutrition-overlap>=4 rr_health graph            (cells 29-31)
  * MiniBatchKMeans cluster graphs: 2000 clusters, 10-NN computed, top-6
    written, centers saved                            (kmeans cells 0-3)

Modality feature extraction (T5/ResNet-50, cells 9-17) is pluggable: this
environment has no model weights (zero egress), so `build_dataset` takes the
feature matrices as inputs; `t5_text_features` / `resnet50_image_features`
are provided for weight-equipped machines.
"""

import os
import pickle

import numpy as np
import pandas as pd
import scipy.sparse as sp

MAX_INGRE_LEN = 20


# --------------------------------------------------------------------- core
def k_core_filter(df, user_col="user_id", item_col="recipe_id", k=5):
    """Iteratively drop users/items with < k interactions until stable
    (foodcom_process.ipynb cell 0)."""
    while True:
        user_counts = df[user_col].value_counts()
        item_counts = df[item_col].value_counts()
        valid_users = user_counts[user_counts >= k].index
        valid_items = item_counts[item_counts >= k].index
        filtered = df[df[user_col].isin(valid_users)
                      & df[item_col].isin(valid_items)]
        if len(filtered) == len(df):
            return filtered
        df = filtered


def temporal_split(df, date_col="date", user_col="user_id",
                   ratios=(0.6, 0.1, 0.3)):
    """Sort by date, split 60/10/30, keep only users present in both train
    and test (cell 2)."""
    df = df.sort_values(date_col).reset_index(drop=True)
    n = len(df)
    a = int(ratios[0] * n)
    b = int((ratios[0] + ratios[1]) * n)
    train, valid, test = df[:a], df[a:b], df[b:]
    keep = set(train[user_col]) & set(test[user_col])
    return (train[train[user_col].isin(keep)],
            valid[valid[user_col].isin(keep)],
            test[test[user_col].isin(keep)])


def encode_ids(splits, user_col="user_id", item_col="recipe_id"):
    """Remap raw ids to 0..n-1 with sorted-classes semantics (LabelEncoder
    parity, cell 3). Returns (remapped splits, user_to_idx, item_to_idx)."""
    users = sorted(set().union(*[set(s[user_col]) for s in splits]))
    items = sorted(set().union(*[set(s[item_col]) for s in splits]))
    user_to_idx = {v: i for i, v in enumerate(users)}
    item_to_idx = {v: i for i, v in enumerate(items)}
    out = []
    for s in splits:
        s = s.copy()
        s["u"] = s[user_col].map(user_to_idx)
        s["i"] = s[item_col].map(item_to_idx)
        out.append(s)
    return out, user_to_idx, item_to_idx


def write_rating_files(out_dir, train, valid, test, rating=5.0):
    """`u \t i \t rating \t 0` rows grouped by user (the loaders expect
    consecutive per-user runs, dataset.py:137-155)."""
    os.makedirs(out_dir, exist_ok=True)
    for name, split in (("train", train), ("valid", valid), ("test", test)):
        split = split.sort_values(["u", "i"])
        with open(os.path.join(out_dir, f"data.{name}.rating"), "w") as f:
            for u, i in zip(split["u"], split["i"]):
                f.write(f"{int(u)}\t{int(i)}\t{rating}\t0\n")


# --------------------------------------------------------------- ingredients
def build_ingredient_codes(item_to_ingres, n_items, out_dir,
                           max_len=MAX_INGRE_LEN):
    """Filter to ingredients seen in the corpus, re-encode sorted, emit the
    padded code matrix (pad id = n_ingredients), counts file, and ri_graph
    (cells 7-8). `item_to_ingres`: dict item_idx -> list of raw ingre ids."""
    final = sorted(set(x for lst in item_to_ingres.values() for x in lst))
    ingre_to_idx = {v: i for i, v in enumerate(final)}
    pad = len(final)
    width = max(max((len(v) for v in item_to_ingres.values()), default=1),
                1)
    width = min(width, max_len)
    codes = np.full((n_items, width), pad, dtype=np.int64)
    nums = np.zeros(n_items, dtype=np.int64)
    ri = []
    for i in range(n_items):
        lst = [ingre_to_idx[x] for x in item_to_ingres.get(i, [])][:width]
        nums[i] = len(lst)
        codes[i, :len(lst)] = lst
        ri.extend((i, g) for g in lst)

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "data_ingre_code_file.npy"), codes)
    with open(os.path.join(out_dir, "data_id_ingre_num_file"), "w") as f:
        for i in range(n_items):
            f.write(f"{i}\t{int(nums[i])}\n")
    ri_arr = np.asarray(ri, dtype=np.int64)
    np.savetxt(os.path.join(out_dir, "ri_graph.txt"), ri_arr, fmt="%d")
    return codes, nums, ingre_to_idx


# ----------------------------------------------------------------- negatives
def sample_eval_negatives(train, eval_split, n_items, out_path, n_neg=500,
                          alpha=0.7, seed=2024, all_user_positives=None):
    """Popularity^alpha-biased negatives per eval user, excluding that
    user's *train* positives, written as `(u:[pos..])\tn1..nK` rows in user
    order (cell 18 semantics: draws 2K candidates by popularity without
    replacement, removes the user's train items, keeps K)."""
    rng = np.random.RandomState(seed)
    item_count = train.groupby("i").size()
    all_items = item_count.index.to_numpy()
    pop = item_count.to_numpy() / item_count.sum()
    prob = pop ** alpha
    prob = prob / prob.sum()

    user_train = train.groupby("u")["i"].apply(set).to_dict()
    eval_pos = eval_split.groupby("u")["i"].apply(list).to_dict()

    with open(out_path, "w") as f:
        for u in sorted(eval_pos):
            seq = user_train.get(u, set())
            if len(all_items) - len(seq) < n_neg:
                raise ValueError(
                    f"user {u}: only {len(all_items) - len(seq)} candidate "
                    f"items for {n_neg} negatives — reduce n_neg")
            samples = []
            while len(samples) < n_neg:
                draw = rng.choice(all_items, min(2 * n_neg, len(all_items)),
                                  replace=False, p=prob)
                samples = list(set(draw.tolist()) - seq)
            samples = samples[:n_neg]
            pos = eval_pos[u]
            negs = "\t".join(str(int(x)) for x in samples)
            f.write(f"(u:{pos})\t{negs}\n")


# -------------------------------------------------------------------- graphs
def write_train_artifacts(train, n_users, n_items, base_dir):
    """inter_coo_matrix.pkl + graph_edge/ur_graph.txt (cells 24-26)."""
    coo = sp.coo_matrix(
        (np.ones(len(train), np.float32), (train["u"], train["i"])),
        shape=(n_users, n_items))
    with open(os.path.join(base_dir, "inter_coo_matrix.pkl"), "wb") as f:
        pickle.dump(coo, f)
    gdir = os.path.join(base_dir, "graph_edge")
    os.makedirs(gdir, exist_ok=True)
    ur = np.stack([train["u"].to_numpy(), train["i"].to_numpy()], axis=1)
    np.savetxt(os.path.join(gdir, "ur_graph.txt"), ur, fmt="%d")
    return coo


def build_calorie_levels(calories_by_item, base_dir, bucket=50):
    """int(cal/bucket) label-encoded to dense levels -> rc_graph.txt +
    recipe_cal_level_dict.pkl + level map (cell 28)."""
    buckets = {i: int(c // bucket) for i, c in calories_by_item.items()}
    classes = sorted(set(buckets.values()))
    to_idx = {v: k for k, v in enumerate(classes)}
    cal_dict = {i: to_idx[b] for i, b in sorted(buckets.items())}

    gdir = os.path.join(base_dir, "graph_edge")
    os.makedirs(gdir, exist_ok=True)
    rc = np.asarray(sorted(cal_dict.items()), dtype=np.int64)
    np.savetxt(os.path.join(gdir, "rc_graph.txt"), rc, fmt="%d")
    with open(os.path.join(gdir, "recipe_cal_level_dict.pkl"), "wb") as f:
        pickle.dump(cal_dict, f)
    with open(os.path.join(gdir, "recipe_cal_level_map.pkl"), "wb") as f:
        pickle.dump(to_idx, f)
    return cal_dict


# WHO-style criteria (foodcom cell 29; %DV thresholds)
FOODCOM_HEALTH_CRITERIA = (
    lambda r: 15 <= r["fat"] <= 30,
    lambda r: r["sugar"] < 10,
    lambda r: r["sodium"] < 83,
    lambda r: 10 <= r["protein"] <= 15,
    lambda r: r["saturated_fat"] < 10,
    lambda r: 55 <= r["carbohydrates"] <= 75,
)

# Allrecipes variant (allrecipes_process.ipynb cells 28-29): sugar/sodium are
# absolute amounts rather than %DV, and a 7th fiber criterion is added.
ALLRECIPES_HEALTH_CRITERIA = (
    lambda r: 15 <= r["fat"] <= 30,
    lambda r: r["sugar"] < 5,
    lambda r: r["sodium"] < 2000,
    lambda r: 10 <= r["protein"] <= 15,
    lambda r: r["saturated_fat"] < 10,
    lambda r: 55 <= r["carbohydrates"] <= 75,
    lambda r: r["fiber"] > 10,
)


def build_health_levels(nutrition_df, base_dir,
                        criteria=FOODCOM_HEALTH_CRITERIA,
                        rr_overlap_threshold=3):
    """Scalar health score + multi-hot dict + rh_graph + rr_health co-graph
    (cells 29-31). nutrition_df: one row per item idx `i` with the nutrient
    columns the criteria read."""
    nutrition_df = nutrition_df.sort_values("i").reset_index(drop=True)
    n_items = int(nutrition_df["i"].max()) + 1
    flags = np.zeros((n_items, len(criteria)), dtype=np.float32)
    for _, row in nutrition_df.iterrows():
        i = int(row["i"])
        flags[i] = [1.0 if c(row) else 0.0 for c in criteria]
    score = flags.sum(axis=1).astype(np.int64)

    gdir = os.path.join(base_dir, "graph_edge")
    os.makedirs(gdir, exist_ok=True)
    rh = np.stack([np.arange(n_items), score], axis=1)
    np.savetxt(os.path.join(gdir, "rh_graph.txt"), rh, fmt="%d")
    with open(os.path.join(gdir, "recipe_health_level_dict.pkl"), "wb") as f:
        pickle.dump({i: int(score[i]) for i in range(n_items)}, f)
    with open(os.path.join(gdir, "recipe_health_level_multi_hot_dict.pkl"),
              "wb") as f:
        pickle.dump({i: flags[i].tolist() for i in range(n_items)}, f)

    # items sharing > threshold satisfied criteria (cell 31)
    m = sp.csr_matrix(flags)
    co = (m @ m.T).tolil()
    co.setdiag(0)
    co = co.tocsr()
    co.data[co.data <= rr_overlap_threshold] = 0
    co.eliminate_zeros()
    coo = co.tocoo()
    rr = np.stack([coo.row, coo.col, coo.data.astype(np.int64)], axis=1)
    np.savetxt(os.path.join(gdir, "rr_health_graph.txt"), rr, fmt="%d")
    return score, flags


# keyword tag sets shared by both reference notebooks (foodcom cell 27 /
# allrecipes cell 24): ingredients whose *name* contains the same keyword
# get pairwise ii edges
INGRE_KEYWORD_SETS = (
    ("white", "black", "red", "green", "yellow"),                 # colors
    ("slice", "dice", "minced", "powder", "roll", "shred"),       # shapes
    ("deep-fry", "dry", "fry", "steam", "boil", "pickle"),        # cooking
)


def keyword_tag_edges(names_by_idx, keyword_sets=INGRE_KEYWORD_SETS,
                      singleton_keep_p=None, seed=2024):
    """Ingredient-ingredient edges from shared name keywords (foodcom
    cell 27): per keyword, every pair of ingredients whose name contains it
    gets an (i<j) edge; pairs are deduped across keywords and written in
    BOTH directions. `singleton_keep_p` reproduces the Allrecipes variant
    (cell 24): edges supported by exactly one keyword are kept with that
    probability. Returns an int64 [E, 2] array (possibly empty)."""
    from collections import defaultdict

    edge_count = defaultdict(int)
    for kwset in keyword_sets:
        for kw in kwset:
            members = [i for i, name in names_by_idx.items() if kw in name]
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    edge_count[(members[a], members[b])] += 1
    rng = np.random.RandomState(seed)
    edges = []
    for (i, j), count in edge_count.items():
        if (singleton_keep_p is not None and count == 1
                and rng.rand() >= singleton_keep_p):
            continue
        edges.append([i, j])
        edges.append([j, i])
    return (np.asarray(edges, dtype=np.int64) if edges
            else np.zeros((0, 2), dtype=np.int64))


def cooccurrence_graph(item_tags, n_nodes, threshold=0):
    """Generic tag-co-occurrence edges (the reference's ii keyword graph,
    foodcom cell 27): nodes sharing > threshold tags get an edge."""
    tag_ids = {t: k for k, t in enumerate(
        sorted(set(t for tags in item_tags.values() for t in tags)))}
    m = sp.lil_matrix((n_nodes, len(tag_ids)), dtype=np.float32)
    for i, tags in item_tags.items():
        for t in tags:
            m[i, tag_ids[t]] = 1.0
    m = m.tocsr()
    co = (m @ m.T).tolil()
    co.setdiag(0)
    co = co.tocsr()
    co.data[co.data <= threshold] = 0
    co.eliminate_zeros()
    coo = co.tocoo()
    return np.stack([coo.row, coo.col], axis=1)


# -------------------------------------------------------------------- kmeans
def kmeans_cluster_edges(features, out_dir, modality, n_clusters=2000,
                         top_k=6, knn_k=10, seed=2024, chunk=2048):
    """MiniBatchKMeans(2000, init_size=512, batch_size=1024, seed 2024) over
    the feature matrix; per item the 10 nearest centers are computed and the
    top-6 written as edges; centers saved (kmeans cells 0-3). Distances are
    computed as blocked matmuls instead of a per-item python loop."""
    from sklearn.cluster import MiniBatchKMeans

    n_clusters = min(n_clusters, len(features))
    km = MiniBatchKMeans(n_clusters=n_clusters, init_size=512,
                         batch_size=1024, random_state=seed, n_init=3)
    km.fit(features)
    centers = km.cluster_centers_

    c_norm = (centers ** 2).sum(axis=1)
    edges = []
    for s in range(0, len(features), chunk):
        x = features[s:s + chunk]
        d2 = ((x ** 2).sum(axis=1, keepdims=True)
              - 2 * x @ centers.T + c_norm[None, :])
        nearest = np.argsort(d2, axis=1)[:, :knn_k][:, :top_k]
        for row, cs in enumerate(nearest):
            edges.extend((s + row, int(c)) for c in cs)

    os.makedirs(out_dir, exist_ok=True)
    arr = np.asarray(edges, dtype=np.int64)
    np.savetxt(os.path.join(out_dir, f"{modality}_cluster_edge.txt"),
               arr, fmt="%d")
    np.save(os.path.join(out_dir, f"{modality}_center.npy"), centers)
    return arr, centers


# ------------------------------------------------------------------ features
def t5_text_features(texts, model_name="t5-small", batch_size=64,
                     tokenizer=None, encoder=None):
    """Mean-pooled T5 encoder features (cells 9-14). Weights are downloaded
    unless `tokenizer`/`encoder` are injected (tests pass mocks; zero-egress
    environments cannot fetch the real ones). Contract: float32 [N, 512]
    (D = the encoder's hidden size), attention-mask-weighted mean pooling
    over the sequence axis."""
    import torch

    if tokenizer is None or encoder is None:
        from transformers import T5EncoderModel, T5Tokenizer

        tokenizer = T5Tokenizer.from_pretrained(model_name)
        encoder = T5EncoderModel.from_pretrained(model_name).eval()
    tok, enc = tokenizer, encoder
    out = []
    with torch.no_grad():
        for s in range(0, len(texts), batch_size):
            batch = tok(texts[s:s + batch_size], return_tensors="pt",
                        padding=True, truncation=True)
            h = enc(**batch).last_hidden_state
            mask = batch["attention_mask"][..., None]
            out.append(((h * mask).sum(1) / mask.sum(1)).numpy())
    return np.concatenate(out).astype(np.float32)


def resnet50_image_features(image_paths, batch_size=32, backbone=None,
                            transform=None):
    """ResNet-50 (fc=Identity) 2048-d features (cells 16-17). Weights are
    downloaded unless `backbone` is injected (tests pass a mock; zero-egress
    environments cannot fetch the real ones). Contract: float32 [N, 2048]
    (D = the backbone's output width), 256-resize / 224-center-crop /
    ImageNet-normalized inputs."""
    import torch

    if backbone is None:
        import torchvision

        backbone = torchvision.models.resnet50(weights="IMAGENET1K_V2")
        backbone.fc = torch.nn.Identity()
    model = backbone.eval()
    if transform is None:
        import torchvision

        transform = torchvision.transforms.Compose([
            torchvision.transforms.Resize(256),
            torchvision.transforms.CenterCrop(224),
            torchvision.transforms.ToTensor(),
            torchvision.transforms.Normalize([0.485, 0.456, 0.406],
                                             [0.229, 0.224, 0.225]),
        ])
    tfm = transform
    from PIL import Image

    out = []
    with torch.no_grad():
        for s in range(0, len(image_paths), batch_size):
            imgs = torch.stack([tfm(Image.open(p).convert("RGB"))
                                for p in image_paths[s:s + batch_size]])
            out.append(model(imgs).numpy())
    return np.concatenate(out).astype(np.float32)


# -------------------------------------------------------------------- driver
def build_dataset(out_root, interactions, item_to_ingres, image_features,
                  text_features, calories_by_item=None, nutrition_df=None,
                  date_col="date", user_col="user_id", item_col="recipe_id",
                  k_core=5, n_neg=500, n_clusters=2000, seed=2024,
                  presplit=None, cal_bucket=50,
                  health_criteria=FOODCOM_HEALTH_CRITERIA,
                  ingre_names=None, ii_singleton_keep_p=None,
                  write_health_sample=False):
    """Full offline pipeline: raw interaction dataframe + RAW-id-keyed
    per-item metadata -> the on-disk contract consumed by FoodData.

    `item_to_ingres`: dict raw_item_id -> list of raw ingredient ids.
    `image_features` / `text_features`: dict raw_item_id -> 1-D vector.
    `calories_by_item`: dict raw_item_id -> calories.
    `nutrition_df`: dataframe with `item_col` + nutrient columns.
    `presplit`: optional (train, valid, test) raw dataframes — skips the
        k-core filter and temporal split (the Allrecipes path, which ships
        its own core splits, allrecipes_process.ipynb cell 2).
    `cal_bucket`: calorie bucket width (foodcom 50 / allrecipes 30).
    `health_criteria`: per-row predicates (FOODCOM_/ALLRECIPES_ variants).
    `ingre_names`: dict raw_ingre_id -> name; enables the keyword ii_graph
        (FGCN input, foodcom cell 27 / allrecipes cell 24) with optional
        `ii_singleton_keep_p` subsampling of single-keyword edges.
    `write_health_sample`: also emit graph_edge/health_sample_dict.pkl
        (health-stratified second-negative buckets, the shape the runtime
        loads at dataset.py:286-292; the reference repo consumes but never
        generates this file — neg_sample_set defaults to all train users).
    """
    base = os.path.join(out_root, "processed_dataset")
    os.makedirs(base, exist_ok=True)

    if presplit is not None:
        train, valid, test = presplit
    else:
        df = k_core_filter(interactions, user_col, item_col, k=k_core)
        train, valid, test = temporal_split(df, date_col, user_col)
    (train, valid, test), user_to_idx, item_to_idx = encode_ids(
        [train, valid, test], user_col, item_col)
    n_users = len(user_to_idx)
    n_items = len(item_to_idx)
    write_rating_files(base, train, valid, test)

    sample_eval_negatives(train, valid, n_items,
                          os.path.join(base, "data.valid.negative"),
                          n_neg=n_neg, seed=seed)
    sample_eval_negatives(train, test, n_items,
                          os.path.join(base, "data.test.negative"),
                          n_neg=n_neg, seed=seed)

    raw_in_idx_order = sorted(item_to_idx, key=item_to_idx.get)
    image_features = np.stack([np.asarray(image_features[r], np.float32)
                               for r in raw_in_idx_order])
    text_features = np.stack([np.asarray(text_features[r], np.float32)
                              for r in raw_in_idx_order])
    np.save(os.path.join(base, "data_image_features_float.npy"),
            image_features)
    np.save(os.path.join(base, "data_text_features_t5.npy"), text_features)

    item_to_ingres = {item_to_idx[r]: v for r, v in item_to_ingres.items()
                      if r in item_to_idx}
    _, _, ingre_to_idx = build_ingredient_codes(item_to_ingres, n_items, base)
    with open(os.path.join(base, "mapping_dict.pkl"), "wb") as f:
        pickle.dump((user_to_idx, item_to_idx, ingre_to_idx), f)
    # graph_edge copy of ri_graph (non-small_ingre path)
    gdir = os.path.join(base, "graph_edge")
    os.makedirs(gdir, exist_ok=True)
    import shutil

    shutil.copy(os.path.join(base, "ri_graph.txt"),
                os.path.join(gdir, "ri_graph.txt"))

    if ingre_names is not None:
        names_by_idx = {ingre_to_idx[r]: str(ingre_names[r])
                        for r in ingre_to_idx if r in ingre_names}
        ii = keyword_tag_edges(names_by_idx,
                               singleton_keep_p=ii_singleton_keep_p,
                               seed=seed)
        np.savetxt(os.path.join(gdir, "ii_graph.txt"), ii, fmt="%d")

    write_train_artifacts(train, n_users, n_items, base)
    if calories_by_item is not None:
        build_calorie_levels(
            {item_to_idx[r]: c for r, c in calories_by_item.items()
             if r in item_to_idx}, base, bucket=cal_bucket)
    if nutrition_df is not None:
        ndf = nutrition_df[nutrition_df[item_col].isin(item_to_idx)].copy()
        ndf["i"] = ndf[item_col].map(item_to_idx)
        score, _ = build_health_levels(ndf, base, criteria=health_criteria)
        if write_health_sample:
            # runtime contract (dataset.py:286-292 / reference
            # dataloader.py:22-25): (neg_sample_set, health_0..health_5);
            # scores above 5 fold into the top bucket
            by_level = [[] for _ in range(6)]
            for i, s in enumerate(score):
                by_level[min(int(s), 5)].append(i)
            neg_sample_set = set(train["u"].astype(int).tolist())
            with open(os.path.join(gdir, "health_sample_dict.pkl"),
                      "wb") as f:
                pickle.dump((neg_sample_set, *by_level), f)

    cluster_dir = os.path.join(base, "cluster")
    kmeans_cluster_edges(np.asarray(image_features, np.float32), cluster_dir,
                         "image", n_clusters=n_clusters, seed=seed)
    kmeans_cluster_edges(np.asarray(text_features, np.float32), cluster_dir,
                         "text", n_clusters=n_clusters, seed=seed)
    # CLUSSL's pretrained-center location (pricai_modelx.py:78-80)
    mm_dir = os.path.join(base, "mm_cluster")
    os.makedirs(mm_dir, exist_ok=True)
    for modality in ("image", "text"):
        shutil.copy(os.path.join(cluster_dir, f"{modality}_center.npy"),
                    os.path.join(mm_dir, f"{modality}_center.npy"))

    return {"n_users": n_users, "n_items": n_items,
            "user_to_idx": user_to_idx, "item_to_idx": item_to_idx,
            "base": base}
