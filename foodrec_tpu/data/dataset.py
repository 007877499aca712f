# coding: utf-8
"""Host-side dataset layer: loads the on-disk FoodRec data contract.

Implements the same attribute surface as the reference FoodData
(FoodRec/utils/dataset.py:11-370) — InteractionData + GraphData — but with
vectorized numpy/pandas parsing instead of per-line Python loops, because on
TPU the dataset is read once and then lives on device for the whole run.

On-disk contract (SURVEY.md §2.2, produced by dataset_process notebooks):
  data.{train,valid,test}.rating       tab-separated "user \t item \t rating ..."
  data.{valid,test}.negative           "(u:[...])\t neg1 ... neg500" per user row
  data_image_features_float.npy        [n_items, 2048] float
  data_text_features_t5.npy            [n_items, 512] float
  data_ingre_code_file.npy             [n_items, 20] int, pad id = n_ingredients
  data_id_ingre_num_file               "item \t count" per line
  inter_coo_matrix.pkl                 scipy.sparse train COO
  graph_edge/{ur,rr,ri,ii,rc,rh}_graph.txt   int triples
  cluster/{image,text}_cluster_edge.txt      float triples (item, cluster)
  recipe_{cal,health}_level[_multi_hot]_dict.pkl
"""

import os
import pickle
from collections import defaultdict

import numpy as np
import pandas as pd


def _read_rating_file(path):
    """Parse a tab-separated rating file -> (users, items, ratings) int/float arrays."""
    df = pd.read_csv(path, sep="\t", header=None, usecols=[0, 1, 2],
                     names=["u", "i", "r"], dtype={0: np.int64, 1: np.int64, 2: np.float64})
    return df["u"].to_numpy(), df["i"].to_numpy(), df["r"].to_numpy()


def _group_by_consecutive_user(users, items):
    """Group items by user in file order (users appear in sorted runs).

    Returns (lists, user_ids) matching load_valid_file_as_list
    (dataset.py:115-135): one list per distinct user, in order of appearance.
    """
    lists, user_ids = [], []
    if len(users) == 0:
        return lists, user_ids
    boundaries = np.flatnonzero(np.diff(users) != 0) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(users)]])
    for s, e in zip(starts, ends):
        lists.append(list(items[s:e]))
        user_ids.append(int(users[s]))
    return lists, user_ids


def _read_negative_file(path, n_neg=None):
    """Parse a .negative file: each row "(u:[pos..])\tn1\t...\tnK" -> list of
    int lists. Uses the native C++ parser when the row width is known and
    regular (foodrec_tpu/native/fastload.cpp), else pure python."""
    if n_neg:
        from foodrec_tpu import native

        arr = native.parse_negatives(path, n_neg)
        if arr is not None:
            return arr.tolist()
    negatives = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            negatives.append([int(x) for x in parts[1:]])
    return negatives


class InteractionData:
    """Interaction files + modality features (reference: dataset.py:11-270)."""

    def __init__(self, config):
        self.args_config = config
        interaction_path = config["interaction_data_path"]
        ingre_path = config["ingre_data_path"]

        tr_u, tr_i, tr_r = _read_rating_file(interaction_path + "data.train.rating")
        va_u, va_i, _ = _read_rating_file(interaction_path + "data.valid.rating")
        te_u, te_i, _ = _read_rating_file(interaction_path + "data.test.rating")

        # train-file-derived shape (dataset.py:157-176); implicit 0/1 with only
        # rating>0 kept
        self.num_users = int(tr_u.max()) + 1
        self.num_items = int(tr_i.max()) + 1
        keep = tr_r > 0
        self._train_u = tr_u[keep].astype(np.int64)
        self._train_i = tr_i[keep].astype(np.int64)

        # per-user train lists, assumes users 0..num_users-1 in consecutive
        # runs (dataset.py:137-155)
        self.trainList = [[] for _ in range(self.num_users)]
        for lst, uid in zip(*_group_by_consecutive_user(tr_u, tr_i)):
            self.trainList[uid].extend(lst)

        n_neg = config["neg_sample_num"]
        self.testRatings, _ = _group_by_consecutive_user(te_u, te_i)
        self.testNegatives = _read_negative_file(
            interaction_path + "data.test.negative", n_neg)
        assert len(self.testRatings) == len(self.testNegatives)

        self.validRatings, self.valid_users = _group_by_consecutive_user(va_u, va_i)
        self.validNegatives = _read_negative_file(
            interaction_path + "data.valid.negative", n_neg)
        assert len(self.validRatings) == len(self.validNegatives)

        # valid ∪ test positives per user, for negative-sampling exclusion
        # (dataset.py:93-113)
        self.validTestRatings = {u: set() for u in range(self.num_users)}
        for u, i in zip(va_u, va_i):
            self.validTestRatings[int(u)].add(int(i))
        for u, i in zip(te_u, te_i):
            self.validTestRatings[int(u)].add(int(i))

        self.cold_list, self.cold_num, self.train_item_list = self._cold_start_items()

        # raw [u, i] interaction arrays; items are shifted by +num_users below
        # in generate_user_dict (dataset.py:188-205)
        self.train_data = np.stack([tr_u, tr_i], axis=1).astype(np.int64)
        self.valid_data = np.stack([va_u, va_i], axis=1).astype(np.int64)
        self.test_data = np.stack([te_u, te_i], axis=1).astype(np.int64)
        (self.train_user_dict, self.valid_user_dict,
         self.test_user_dict) = self._generate_user_dict()

        # mmap: the 2048-d image table is ~245MB at Foodcom scale; defer the
        # read to the single device_put instead of an extra host copy
        self.embImage = np.load(
            interaction_path + "data_image_features_float.npy", mmap_mode="r")
        self.image_size = self.embImage.shape[1]
        self.embText = np.load(ingre_path + "data_text_features_t5.npy",
                               mmap_mode="r")
        self.text_size = self.embText.shape[1]

        self.ingredientNum = self._load_ingredient_num(
            ingre_path + "data_id_ingre_num_file")
        self.ingredientCodeDict = np.load(ingre_path + "data_ingre_code_file.npy")
        # pad id == n_ingredients (dataset.py:53)
        self.num_ingredients = int(np.max(self.ingredientCodeDict))

        self._statistics()

        if config["interaction_data_path"] != config["graph_data_path"]:
            coo_path = config["interaction_data_path"] + "inter_coo_matrix.pkl"
        else:
            coo_path = config["graph_data_path"] + "inter_coo_matrix.pkl"
        with open(coo_path, "rb") as f:
            self.train_coo_matrix = pickle.load(f).astype(np.float32)

        if config["cold_study"]:
            p = config["interaction_data_path"] + "cold_start/"
            self.coldRatings, self.cold_users = _group_by_consecutive_user(
                *_read_rating_file(p + "data.cold.rating")[:2])
            self.coldNegatives = _read_negative_file(p + "data.cold.negative")
            self.warmRatings, self.warm_users = _group_by_consecutive_user(
                *_read_rating_file(p + "data.warm.rating")[:2])
            self.warmNegatives = _read_negative_file(p + "data.warm.negative")
        if config["sense_study"]:
            p = config["interaction_data_path"] + "sense_user/"
            self.senseRatings, self.sense_users = _group_by_consecutive_user(
                *_read_rating_file(p + "data.sense.rating")[:2])
            self.senseNegatives = _read_negative_file(p + "data.sense.negative")
            self.unsenseRatings, self.unsense_users = _group_by_consecutive_user(
                *_read_rating_file(p + "data.unsense.rating")[:2])
            self.unsenseNegatives = _read_negative_file(p + "data.unsense.negative")
        if config["health_level_study"]:
            p = config["interaction_data_path"] + "health_level/"
            self.healthRatings = defaultdict(list)
            self.healthNegatives = defaultdict(list)
            self.healthUsers = defaultdict(list)
            for hl in range(6):
                self.healthNegatives[hl] = _read_negative_file(
                    p + f"data_health{hl}.negative")
                self.healthRatings[hl], self.healthUsers[hl] = (
                    _group_by_consecutive_user(
                        *_read_rating_file(p + f"data_health{hl}.rating")[:2]))

    # -- helpers --------------------------------------------------------------
    def _cold_start_items(self):
        """Cold items = (valid ∪ test items) − train items (dataset.py:258-270)."""
        train_items = set(self._train_i.tolist())
        eval_items = set()
        for r in self.testRatings:
            eval_items.update(r)
        for r in self.validRatings:
            eval_items.update(r)
        c_list = list(eval_items - train_items)
        return c_list, len(c_list), list(train_items)

    def _generate_user_dict(self):
        num_users = int(max(self.train_data[:, 0].max(),
                            self.valid_data[:, 0].max(),
                            self.test_data[:, 0].max())) + 1
        # item ids shifted by +num_users in the interaction arrays
        # (dataset.py:197-199) — graph models expect this id space
        self.train_data[:, 1] += num_users
        self.valid_data[:, 1] += num_users
        self.test_data[:, 1] += num_users

        def build(mat):
            d = defaultdict(list)
            for u, i in mat:
                d[int(u)].append(int(i))
            return d

        return build(self.train_data), build(self.valid_data), build(self.test_data)

    @staticmethod
    def _load_ingredient_num(path):
        df = pd.read_csv(path, sep="\t", header=None, names=["i", "n"])
        return df["n"].to_numpy().tolist()

    def _statistics(self):
        def id_range(idx):
            mins = min(self.train_data[:, idx].min(), self.valid_data[:, idx].min(),
                       self.test_data[:, idx].min())
            maxs = max(self.train_data[:, idx].max(), self.valid_data[:, idx].max(),
                       self.test_data[:, idx].max())
            return (int(mins), int(maxs)), int(maxs - mins + 1)

        self.user_range, self.n_users = id_range(0)
        self.item_range, self.n_items = id_range(1)
        self.n_train = len(self.train_data)
        self.n_valid = len(self.valid_data)
        self.n_test = len(self.test_data)
        self.inter_num = self.n_train + self.n_valid + self.n_test


class GraphData:
    """Flag-gated graph edge lists (reference: dataset.py:273-348)."""

    def __init__(self, config):
        self.num_health_level = 0
        self.num_calories_level = 0
        self.n_relations = 0
        graph_path = config["graph_data_path"]
        interaction_path = config["interaction_data_path"]
        ingre_path = (config["ingre_data_path"] if config["small_ingre"]
                      else graph_path)

        def triples(path):
            return pd.read_csv(path, sep=r"\s+", header=None).to_numpy(np.int64)

        if config["load_UserRecipe_graph"]:
            self.uRecipe_triples = triples(graph_path + "ur_graph.txt")
            self.n_relations += 1
        if config["load_RecipeRecipe_graph"]:
            self.rRecipe_triples = triples(graph_path + "rr_graph.txt")
            self.n_relations += 1
        if config["load_RecipeIngre_graph"]:
            self.rIngre_triples = triples(ingre_path + "ri_graph.txt")
            self.n_relations += 1
        if config["load_IngreIngre_graph"]:
            self.iIngre_triples = triples(graph_path + "ii_graph.txt")
            self.n_relations += 1
        if config["load_RecipeCalories_graph"]:
            self.rCalories_triples = triples(graph_path + "rc_graph.txt")
            self.num_calories_level = int(self.rCalories_triples[:, 1].max()) + 1
            self.n_relations += 1
        if config["load_RecipeHealth_graph"]:
            self.rHealth_triples = triples(graph_path + "rh_graph.txt")
            self.num_health_level = int(self.rHealth_triples[:, 1].max()) + 1
            self.n_relations += 1
        if config["use_cal_level"]:
            self.cal_level = self._load_pickle(graph_path + "recipe_cal_level_dict.pkl")
        if config["use_health_level"]:
            self.health_level = self._load_pickle(
                graph_path + "recipe_health_level_dict.pkl")
        if config["use_health_level_multi_hot"]:
            self.health_level_multi_hot = self._load_pickle(
                graph_path + "recipe_health_level_multi_hot_dict.pkl")
        if config["load_RecipeRecipeCo_graph"]:
            self.rr_co_triples = np.loadtxt(graph_path + "rr_co_graph.txt")
            self.n_relations += 1
        if config["load_RecipeRecipeIng_graph"]:
            self.rr_ing_triples = np.loadtxt(graph_path + "rr_ing_graph.txt")
            self.n_relations += 1
        if config["load_RecipeRecipeHealth_graph"]:
            self.rr_health_triples = np.loadtxt(graph_path + "rr_health_graph.txt")
            self.n_relations += 1
        if config["health_neg_sample"]:
            # health-stratified negative-sampling buckets (reference:
            # dataloader.py:22-25): (neg_sample_set, health_0..health_5)
            with open(graph_path + "health_sample_dict.pkl", "rb") as f:
                (self.neg_sample_set, self.health_0, self.health_1,
                 self.health_2, self.health_3, self.health_4,
                 self.health_5) = pickle.load(f)
        if config["load_ImageCluster_graph"]:
            self.image_cluster_triples = np.loadtxt(
                interaction_path + "cluster/image_cluster_edge.txt")
            self.n_relations += 1
        if config["load_TextCluster_graph"]:
            self.text_cluster_triples = np.loadtxt(
                interaction_path + "cluster/text_cluster_edge.txt")
            self.n_relations += 1

    @staticmethod
    def _load_pickle(path):
        with open(path, "rb") as f:
            return pickle.load(f)


class FoodData(InteractionData, GraphData):
    """Union dataset object (reference: dataset.py:351-370)."""

    def __init__(self, config):
        self.args_config = config
        InteractionData.__init__(self, config)
        GraphData.__init__(self, config)

    def __str__(self):
        info = [str(self.args_config["dataset"])]
        info.append(f"The number of users: {self.n_users}")
        info.append(f"Average actions of users: {self.inter_num / self.n_users}")
        info.append(f"The number of items: {self.n_items}")
        info.append(f"Average actions of items: {self.inter_num / self.n_items}")
        info.append(f"The number of inters: {self.inter_num}")
        sparsity = 1 - self.inter_num / self.n_users / self.n_items
        info.append(f"The sparsity of the dataset: {sparsity * 100}%")
        return "\n".join(info)


def derive_data_paths(config, dataset_name):
    """Path derivation from quick_start.py:21-23."""
    base = config["data_path"] + dataset_name + "/processed_dataset/"
    config["interaction_data_path"] = base
    config["graph_data_path"] = base + "graph_edge/"
    config["ingre_data_path"] = base
    return config
