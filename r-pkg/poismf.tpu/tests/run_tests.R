# Self-contained correctness script for poismf.tpu (run where R +
# reticulate + poismf_tpu are available; the build image of this repository
# has no R toolchain, so this is NOT exercised by the repo's CI).
#
# Checks, mirroring tests/test_model_api.py of the Python framework:
#   1. fit on a data.frame -> model object fields, factor shapes
#   2. get.factor.matrices / get.model.mappings contracts
#   3. predict() vector + sparse-matrix forms agree with an R-side dot
#   4. topN with include / exclude, output_score roundtrip
#   5. factors.single / factors consistency for an existing user's data
#   6. the pg "auto" maxupd -> 1 R quirk

suppressMessages({
    library(poismf.tpu)
    library(Matrix)
})

stopifnot_close <- function(a, b, tol = 1e-4, what = "") {
    if (max(abs(a - b)) > tol * (1 + max(abs(b))))
        stop(sprintf("mismatch %s: %g", what, max(abs(a - b))))
}

set.seed(1)
n_users <- 120L; n_items <- 90L; nnz <- 1500L
df <- data.frame(
    UserId = sample(sprintf("u%03d", 1:n_users), nnz, replace = TRUE),
    ItemId = sample(sprintf("i%03d", 1:n_items), nnz, replace = TRUE),
    Count = rpois(nnz, 3) + 1
)
df <- df[!duplicated(df[c("UserId", "ItemId")]), ]

model <- poismf(df, k = 10, method = "tncg", niter = 3)
stopifnot(inherits(model, "poismf"))
stopifnot(nrow(model$A) == 10L, ncol(model$A) == model$dimA)
print(model)

fm <- get.factor.matrices(model)
stopifnot(all(dim(fm$A) == c(model$dimA, 10L)))
stopifnot(identical(row.names(fm$A), model$levels_A))
mp <- get.model.mappings(model)
stopifnot(identical(mp$columns, model$levels_B))

# predict agrees with an explicit factor dot product
u <- df$UserId[1]; it <- df$ItemId[1]
p1 <- predict(model, u, it)
ia <- match(u, model$levels_A); ib <- match(it, model$levels_B)
p2 <- sum(fm$A[ia, ] * fm$B[ib, ])
stopifnot_close(p1, p2, 1e-4, "predict vs dot")

# topN: exclude removes, include restricts, scores sorted descending
r1 <- topN(model, u, n = 5, output_score = TRUE)
stopifnot(length(r1$ix) == 5L, !is.unsorted(rev(r1$score)))
r2 <- topN(model, u, n = 5, exclude = r1$ix[1])
stopifnot(!(r1$ix[1] %in% r2))
r3 <- topN(model, u, n = 3, include = r1$ix)
stopifnot(all(r3 %in% r1$ix))

# factors.single for an existing user's rows approximates their factors
rows <- df[df$UserId == u, c("ItemId", "Count")]
a_vec <- factors.single(model, rows)
stopifnot(length(a_vec) == 10L, all(is.finite(a_vec)), max(a_vec) > 0)

A_new <- factors(model, df)
stopifnot(nrow(A_new) == model$dimA)

# the R-specific pg auto-maxupd quirk
m_pg <- poismf(df, k = 5, method = "pg", niter = 2)
stopifnot(m_pg$maxupd == 1L)

cat("all poismf.tpu R checks passed\n")
