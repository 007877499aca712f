# coding: utf-8
"""Offline-pipeline CLI: raw dataset files -> the on-disk contract.

The reference ships this stage only as notebooks
(dataset_process/{foodcom,allrecipes}_process.ipynb + *_kmeans.ipynb, with
hard-coded absolute paths); this module makes the same pipeline a runnable,
tested command:

    python -m foodrec_tpu.data.preprocess_cli --format foodcom \
        --raw-dir /data/Foodcom/raw_dataset --out /data/Foodcom \
        [--image-dir /data/Foodcom/image_dataset] [--features extract]

    python -m foodrec_tpu.data.preprocess_cli --format allrecipes \
        --raw-dir /data/Allrecipes/raw_dataset --out /data/Allrecipes

    python -m foodrec_tpu.data.preprocess_cli --format generic \
        --raw-dir my_raw/ --out /data/MyDS

Raw inputs per format:

* foodcom (Kaggle "Food.com Recipes and Interactions";
  foodcom_process.ipynb cells 0-32): RAW_interactions.csv
  (user_id, recipe_id, date, ...), PP_recipes.csv (id, ingredient_ids as a
  stringified list), RAW_recipes.csv (id, nutrition as a stringified 7-list
  [cal, fat, sugar, sodium, protein, saturated_fat, carbohydrates]),
  optional ingr_map.pkl (dataframe with id, processed — enables the keyword
  ii_graph and text extraction), optional --image-dir with <recipe_id>.jpg
  (restricts items to those with images, cell 1).
* allrecipes (Kaggle foodRecSys-V1; allrecipes_process.ipynb cells 0-30):
  core-data-{train,valid,test}_rating.csv (user_id, recipe_id, rating,
  dateLastModified — the dataset's own splits are kept, no k-core/temporal
  re-split), core-data_recipe.csv (recipe_id, recipe_name, ingredients
  '^'-separated names, nutritions as a stringified dict). Calorie bucket is
  30 (vs foodcom's 50) and the 7-criterion health variant applies.
* generic: interactions.csv (user_id, item_id, date[, rating]),
  ingredients.csv (item_id, ingredients '^'-separated names), optional
  calories.csv (item_id, calories), optional nutrition.csv (item_id, fat,
  sugar, sodium, protein, saturated_fat, carbohydrates[, fiber]), optional
  images/<item_id>.jpg.

Feature modes: `--features synthesize` (default) writes seeded random
normal features of --image-dim/--text-dim — the dataset loads and trains
everywhere, but modality signal is noise; use only for smoke/scale testing.
`--features extract` runs the real T5-small / ResNet-50 extractors
(preprocess.t5_text_features / resnet50_image_features; needs downloadable
weights + an image dir). Reference text semantics are kept: item text
feature = mean(ingredient-name embeddings + title embedding)
(foodcom cells 9-14).
"""

import argparse
import ast
import os
import sys

import numpy as np
import pandas as pd

from . import preprocess as pp

# foodcom RAW_recipes.csv `nutrition` list layout (cells 28-29)
_FOODCOM_NUTRI_COLS = ("cal", "fat", "sugar", "sodium", "protein",
                       "saturated_fat", "carbohydrates")


def _clean_numeric(series, default=None):
    """Allrecipes %DV cleanup (cell 27): '< 1' -> 0, NaN -> column median."""
    s = pd.to_numeric(series.replace("< 1", "0"), errors="coerce")
    fill = s.median() if default is None else default
    return s.fillna(0.0 if pd.isna(fill) else fill).astype(float)


def load_foodcom_raw(raw_dir, image_dir=None):
    """-> dict of build_dataset inputs (foodcom_process.ipynb cells 0-1,
    7, 28-29)."""
    inter = pd.read_csv(os.path.join(raw_dir, "RAW_interactions.csv"))
    ppr = pd.read_csv(os.path.join(raw_dir, "PP_recipes.csv"))
    inter = inter[inter["recipe_id"].isin(set(ppr["id"]))]
    if image_dir is not None:
        have = set()
        for fn in os.listdir(image_dir):
            stem = os.path.splitext(fn)[0]
            if stem.lstrip("-").isdigit():
                have.add(int(stem))
        inter = inter[inter["recipe_id"].isin(have)]

    item_to_ingres = {
        int(r["id"]): list(ast.literal_eval(str(r["ingredient_ids"])))
        for _, r in ppr.iterrows()}

    raw_recipes = pd.read_csv(os.path.join(raw_dir, "RAW_recipes.csv"))
    nutri = raw_recipes["nutrition"].apply(
        lambda x: ast.literal_eval(str(x)))
    ndf = pd.DataFrame(nutri.tolist(), columns=_FOODCOM_NUTRI_COLS)
    ndf["recipe_id"] = raw_recipes["id"].to_numpy()
    calories = dict(zip(ndf["recipe_id"], ndf["cal"]))

    ingre_names = None
    ingr_map_path = os.path.join(raw_dir, "ingr_map.pkl")
    if os.path.isfile(ingr_map_path):
        imap = pd.read_pickle(ingr_map_path)
        ingre_names = {}
        for _, row in imap.iterrows():
            rid = int(row["id"])
            ingre_names[rid] = (ingre_names.get(rid, "")
                                + str(row["processed"]))

    titles = dict(zip(raw_recipes["id"], raw_recipes.get(
        "name", pd.Series("", index=raw_recipes.index)).astype(str)))
    return dict(interactions=inter, item_to_ingres=item_to_ingres,
                calories_by_item=calories, nutrition_df=ndf,
                date_col="date", user_col="user_id", item_col="recipe_id",
                cal_bucket=50, health_criteria=pp.FOODCOM_HEALTH_CRITERIA,
                ingre_names=ingre_names, ii_singleton_keep_p=None,
                titles=titles, presplit=None)


def _allrec_nutri_field(d, key, sub):
    try:
        return d[key][sub]
    except Exception:
        return np.nan


def load_allrecipes_raw(raw_dir):
    """-> dict of build_dataset inputs (allrecipes_process.ipynb cells
    0-6, 25-29). Keeps the dataset's own core splits."""
    splits = []
    for name in ("train", "valid", "test"):
        df = pd.read_csv(
            os.path.join(raw_dir, f"core-data-{name}_rating.csv"))
        splits.append(df.sort_values(["user_id", "dateLastModified"]))
    train, valid, test = splits
    # users come from train (cell 2); valid/test rows outside are dropped
    users = set(train["user_id"])
    valid = valid[valid["user_id"].isin(users)]
    test = test[test["user_id"].isin(users)]

    recipes = pd.read_csv(os.path.join(raw_dir, "core-data_recipe.csv"))
    item_to_ingres = {
        int(r["recipe_id"]): str(r["ingredients"]).split("^")[:20]
        for _, r in recipes.iterrows()}
    # ingredient "ids" are their names here, so the keyword graph applies
    # to them directly (cell 24), singleton edges kept with p=0.025
    names = sorted(set(x for lst in item_to_ingres.values() for x in lst))
    ingre_names = {n: n for n in names}

    nutris = recipes["nutritions"].apply(lambda x: ast.literal_eval(str(x)))
    ndf = pd.DataFrame({
        "recipe_id": recipes["recipe_id"].to_numpy(),
        "cal": [_allrec_nutri_field(d, "calories", "amount")
                for d in nutris],
        "fat": [_allrec_nutri_field(d, "fat", "percentDailyValue")
                for d in nutris],
        "sugar": [_allrec_nutri_field(d, "sugars", "amount")
                  for d in nutris],
        "sodium": [_allrec_nutri_field(d, "sodium", "amount")
                   for d in nutris],
        "protein": [_allrec_nutri_field(d, "protein", "percentDailyValue")
                    for d in nutris],
        "saturated_fat": [
            _allrec_nutri_field(d, "saturatedFat", "percentDailyValue")
            for d in nutris],
        "carbohydrates": [
            _allrec_nutri_field(d, "carbohydrates", "percentDailyValue")
            for d in nutris],
        "fiber": [_allrec_nutri_field(d, "fiber", "percentDailyValue")
                  for d in nutris],
    })
    for col in ndf.columns:
        if col != "recipe_id":
            ndf[col] = _clean_numeric(ndf[col])
    calories = dict(zip(ndf["recipe_id"], ndf["cal"]))

    titles = dict(zip(recipes["recipe_id"], recipes.get(
        "recipe_name", pd.Series("", index=recipes.index)).astype(str)))
    return dict(interactions=None, item_to_ingres=item_to_ingres,
                calories_by_item=calories, nutrition_df=ndf,
                date_col="dateLastModified", user_col="user_id",
                item_col="recipe_id", cal_bucket=30,
                health_criteria=pp.ALLRECIPES_HEALTH_CRITERIA,
                ingre_names=ingre_names, ii_singleton_keep_p=0.025,
                titles=titles, presplit=(train, valid, test))


def load_generic_raw(raw_dir):
    """-> dict of build_dataset inputs from the documented generic CSVs."""
    inter = pd.read_csv(os.path.join(raw_dir, "interactions.csv"))
    ing = pd.read_csv(os.path.join(raw_dir, "ingredients.csv"))
    item_to_ingres = {
        int(r["item_id"]): str(r["ingredients"]).split("^")[:20]
        for _, r in ing.iterrows()}
    names = sorted(set(x for lst in item_to_ingres.values() for x in lst))
    ingre_names = {n: n for n in names}

    calories = None
    cal_path = os.path.join(raw_dir, "calories.csv")
    if os.path.isfile(cal_path):
        cdf = pd.read_csv(cal_path)
        calories = dict(zip(cdf["item_id"], cdf["calories"]))

    ndf = None
    criteria = pp.FOODCOM_HEALTH_CRITERIA
    nut_path = os.path.join(raw_dir, "nutrition.csv")
    if os.path.isfile(nut_path):
        ndf = pd.read_csv(nut_path).rename(columns={"item_id": "recipe_id"})
        if "fiber" in ndf.columns:
            criteria = pp.ALLRECIPES_HEALTH_CRITERIA

    titles = {i: f"item {i}" for i in item_to_ingres}
    return dict(interactions=inter.rename(
                    columns={"item_id": "recipe_id"}),
                item_to_ingres=item_to_ingres, calories_by_item=calories,
                nutrition_df=ndf, date_col="date", user_col="user_id",
                item_col="recipe_id", cal_bucket=50,
                health_criteria=criteria, ingre_names=ingre_names,
                ii_singleton_keep_p=None, titles=titles, presplit=None)


LOADERS = {"foodcom": load_foodcom_raw, "allrecipes": load_allrecipes_raw,
           "generic": load_generic_raw}


def _item_ids(raw):
    """All raw item ids that can survive encoding (union over splits)."""
    if raw["presplit"] is not None:
        ids = set()
        for s in raw["presplit"]:
            ids |= set(s[raw["item_col"]])
        return ids
    return set(raw["interactions"][raw["item_col"]])


def make_features(raw, mode, image_dir, image_dim, text_dim, seed):
    """-> (image_features, text_features) dicts raw_item_id -> vector."""
    ids = sorted(_item_ids(raw))
    if mode == "synthesize":
        print("WARNING: --features synthesize writes seeded random "
              "modality features; models will train but the image/text "
              "signal is pure noise. Use --features extract with real "
              "weights for research results.", file=sys.stderr)
        rng = np.random.RandomState(seed)
        img = {i: rng.normal(0, 0.1, image_dim).astype(np.float32)
               for i in ids}
        txt = {i: rng.normal(0, 0.1, text_dim).astype(np.float32)
               for i in ids}
        return img, txt

    # extract: reference text semantics (cells 9-14) = mean of the item's
    # ingredient-name embeddings + its title embedding
    names_of = raw["item_to_ingres"]
    ingre_names = raw["ingre_names"] or {}
    uniq = sorted(set(x for lst in names_of.values() for x in lst))
    texts = [str(ingre_names.get(x, x)) for x in uniq]
    ingre_vecs = pp.t5_text_features(texts)
    by_raw = dict(zip(uniq, ingre_vecs))
    titles = raw["titles"]
    title_vecs = pp.t5_text_features([titles.get(i, "") for i in ids])
    txt = {}
    for k, i in enumerate(ids):
        parts = [by_raw[x] for x in names_of.get(i, []) if x in by_raw]
        parts.append(title_vecs[k])
        txt[i] = np.mean(parts, axis=0).astype(np.float32)

    if image_dir is None:
        raise SystemExit("--features extract requires --image-dir")
    paths, kept = [], []
    for i in ids:
        p = os.path.join(image_dir, f"{i}.jpg")
        if os.path.isfile(p):
            paths.append(p)
            kept.append(i)
    missing = set(ids) - set(kept)
    if missing:
        raise SystemExit(
            f"--features extract: {len(missing)} items have no "
            f"{image_dir}/<id>.jpg (e.g. {sorted(missing)[:5]}); filter "
            "interactions to downloaded images first (foodcom cell 1 / "
            "--image-dir on the foodcom loader)")
    vecs = pp.resnet50_image_features(paths)
    img = dict(zip(kept, vecs))
    return img, txt


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m foodrec_tpu.data.preprocess_cli",
        description="Raw dataset files -> the processed_dataset contract "
                    "(reference notebooks as a runnable command)")
    ap.add_argument("--format", required=True, choices=sorted(LOADERS))
    ap.add_argument("--raw-dir", required=True)
    ap.add_argument("--out", required=True,
                    help="dataset root; writes <out>/processed_dataset/ "
                         "(point --data_path at its parent, -d at its name)")
    ap.add_argument("--image-dir", default=None,
                    help="foodcom: restrict items to <id>.jpg present; "
                         "extract: image source")
    ap.add_argument("--features", default="synthesize",
                    choices=["synthesize", "extract"])
    ap.add_argument("--image-dim", type=int, default=2048)
    ap.add_argument("--text-dim", type=int, default=512)
    ap.add_argument("--k-core", type=int, default=5)
    ap.add_argument("--n-neg", type=int, default=500)
    ap.add_argument("--n-clusters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--health-sample-dict", action="store_true",
                    help="also write graph_edge/health_sample_dict.pkl "
                         "(health-stratified negative buckets)")
    args = ap.parse_args(argv)

    raw = LOADERS[args.format](args.raw_dir, args.image_dir) \
        if args.format == "foodcom" else LOADERS[args.format](args.raw_dir)
    img, txt = make_features(raw, args.features, args.image_dir,
                             args.image_dim, args.text_dim, args.seed)

    out = pp.build_dataset(
        args.out, raw["interactions"], raw["item_to_ingres"], img, txt,
        calories_by_item=raw["calories_by_item"],
        nutrition_df=raw["nutrition_df"], date_col=raw["date_col"],
        user_col=raw["user_col"], item_col=raw["item_col"],
        k_core=args.k_core, n_neg=args.n_neg, n_clusters=args.n_clusters,
        seed=args.seed, presplit=raw["presplit"],
        cal_bucket=raw["cal_bucket"],
        health_criteria=raw["health_criteria"],
        ingre_names=raw["ingre_names"],
        ii_singleton_keep_p=raw["ii_singleton_keep_p"],
        write_health_sample=args.health_sample_dict)
    print(f"wrote {out['base']}: {out['n_users']} users x "
          f"{out['n_items']} items")
    return out


if __name__ == "__main__":
    main()
