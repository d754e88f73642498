# R interface to the TPU-native poismf_tpu framework.
#
# API parity target: the reference poismf R package
# (/root/reference/R/poismf.R:221-1039 and /root/reference/NAMESPACE).
# This is NOT a port of that file: the reference R package marshals its
# inputs into C structures and calls .Call() wrappers
# (/root/reference/src/rwrapper.c:87-245); here every input is converted to
# the Python framework's native types through reticulate and all numeric
# work happens in JAX on the configured accelerator.  The model object keeps
# the reference's R-visible layout (fields, [k, dim] factor storage,
# 1-based ids, levels_A/levels_B remapping) so downstream R code written
# against the reference keeps working.

.pmf <- new.env(parent = emptyenv())

#' Lazily import the poismf_tpu Python package (cached per session).
#' @keywords internal
pmf_backend <- function() {
    if (is.null(.pmf$mod)) {
        if (!requireNamespace("reticulate", quietly = TRUE))
            stop("poismf.tpu requires the 'reticulate' package.")
        .pmf$mod <- reticulate::import("poismf_tpu", delay_load = FALSE)
        .pmf$np <- reticulate::import("numpy", convert = FALSE)
        .pmf$scipy <- reticulate::import("scipy.sparse", delay_load = FALSE)
    }
    .pmf$mod
}

# ---------------------------------------------------------------------------
# input conversion (reference accepts data.frame / Matrix dgT,dgC,dgR /
# SparseM coo,csr,csc / dense matrix -- R/poismf.R:274-316)
# ---------------------------------------------------------------------------

#' Convert the accepted X formats to 0-based triplets.
#' Returns list(ix_row, ix_col, vals, dimA, dimB, levels_A, levels_B).
#' @keywords internal
pmf_as_triplets <- function(X) {
    levels_A <- NULL
    levels_B <- NULL
    if (is.data.frame(X)) {
        if (ncol(X) < 3)
            stop("'X' data.frame must have 3 columns (user, item, count).")
        fA <- factor(X[[1L]])
        fB <- factor(X[[2L]])
        levels_A <- levels(fA)
        levels_B <- levels(fB)
        out <- list(
            ix_row = as.integer(fA) - 1L,
            ix_col = as.integer(fB) - 1L,
            vals = as.numeric(X[[3L]]),
            dimA = length(levels_A), dimB = length(levels_B)
        )
    } else if (inherits(X, "sparseMatrix")) {
        Xt <- methods::as(X, "TsparseMatrix")
        out <- list(
            ix_row = Xt@i, ix_col = Xt@j, vals = Xt@x,
            dimA = nrow(Xt), dimB = ncol(Xt)
        )
    } else if (inherits(X, c("matrix.coo", "matrix.csr", "matrix.csc"))) {
        if (!requireNamespace("SparseM", quietly = TRUE))
            stop("SparseM input requires the 'SparseM' package.")
        Xc <- methods::as(X, "matrix.coo")
        out <- list(
            ix_row = Xc@ia - 1L, ix_col = Xc@ja - 1L,
            vals = as.numeric(Xc@ra),
            dimA = Xc@dimension[1L], dimB = Xc@dimension[2L]
        )
    } else if (is.matrix(X)) {
        nz <- which(X != 0, arr.ind = TRUE)
        out <- list(
            ix_row = nz[, 1L] - 1L, ix_col = nz[, 2L] - 1L,
            vals = as.numeric(X[nz]),
            dimA = nrow(X), dimB = ncol(X)
        )
    } else {
        stop(paste0("'X' must be a data.frame with 3 columns, a sparse ",
                    "matrix from 'Matrix' or 'SparseM', or a dense matrix."))
    }
    if (any(out$vals <= 0))
        stop("'X' contains entries with a count of zero or less.")
    out$levels_A <- levels_A
    out$levels_B <- levels_B
    out
}

#' Build a scipy COO matrix from 0-based triplets.
#' @keywords internal
pmf_scipy_coo <- function(tr) {
    pmf_backend()
    np <- .pmf$np
    .pmf$scipy$coo_matrix(
        reticulate::tuple(
            np$asarray(tr$vals, dtype = "float32"),
            reticulate::tuple(
                np$asarray(as.integer(tr$ix_row), dtype = "int32"),
                np$asarray(as.integer(tr$ix_col), dtype = "int32")
            )
        ),
        shape = reticulate::tuple(as.integer(tr$dimA), as.integer(tr$dimB))
    )
}

#' Resolve "auto" hyperparameters.  NOTE the reference's R package sets the
#' pg 'maxupd' default to 1 where the Python package uses 10
#' (R/poismf.R:241 vs poismf/__init__.py:253); replicated faithfully.
#' @keywords internal
pmf_auto_params <- function(method, l2_reg, niter, maxupd, k) {
    if (identical(l2_reg, "auto"))
        l2_reg <- switch(method, "tncg" = 1e3, "cg" = 1e4, "pg" = 1e9)
    if (identical(niter, "auto"))
        niter <- switch(method, "tncg" = 10L, "cg" = 30L, "pg" = 10L)
    if (identical(maxupd, "auto"))
        maxupd <- switch(method, "tncg" = 15L * as.integer(k),
                         "cg" = 5L, "pg" = 1L)
    list(l2_reg = as.numeric(l2_reg), niter = as.integer(niter),
         maxupd = as.integer(maxupd))
}

# ---------------------------------------------------------------------------
# model fitting
# ---------------------------------------------------------------------------

#' @title Factorize a sparse counts matrix on TPU
#' @description Fits the Poisson matrix factorization model of the reference
#' 'poismf' package, with computation running through the TPU-native
#' 'poismf_tpu' framework.  Same signature and defaults as the reference
#' (R/poismf.R:221-228), including the R-specific pg maxupd="auto" -> 1.
#' @export
poismf <- function(X, k = 50, method = "tncg",
                   l2_reg = "auto", l1_reg = 0,
                   niter = "auto", maxupd = "auto",
                   limit_step = TRUE, initial_step = 1e-7,
                   early_stop = TRUE, reuse_prev = FALSE,
                   weight_mult = 1,
                   handle_interrupt = TRUE,
                   nthreads = parallel::detectCores()) {
    allowed_methods <- c("tncg", "cg", "pg")
    if (!(method %in% allowed_methods) || (NROW(method) != 1L))
        stop(paste0("'method' must be one of: ",
                    paste(allowed_methods, collapse = ", ")))
    if (NROW(k) > 1L || k < 1L) stop("'k' must be a positive integer.")
    if (l1_reg < 0 || (!identical(l2_reg, "auto") && l2_reg < 0))
        stop("Regularization parameters must be non-negative.")
    hp <- pmf_auto_params(method, l2_reg, niter, maxupd, k)

    tr <- pmf_as_triplets(X)
    mod <- pmf_backend()
    py_model <- mod$PoisMF(
        k = as.integer(k), method = method, l2_reg = hp$l2_reg,
        l1_reg = as.numeric(l1_reg), niter = hp$niter, maxupd = hp$maxupd,
        limit_step = limit_step, initial_step = as.numeric(initial_step),
        early_stop = early_stop, reuse_prev = reuse_prev,
        weight_mult = as.numeric(weight_mult),
        handle_interrupt = handle_interrupt,
        reindex = FALSE,  # reindexing already done R-side via factor()
        nthreads = as.integer(nthreads)
    )
    py_model$fit(pmf_scipy_coo(tr))

    pmf_wrap_model(py_model, tr, method, hp, l1_reg, limit_step,
                   initial_step, early_stop, reuse_prev, weight_mult,
                   nthreads)
}

#' Assemble the R-visible "poismf" object around the fitted Python model.
#' Factor matrices are stored TRANSPOSED [k, dim] exactly like the reference
#' (R/poismf.R:161-164: column-major R makes per-row factor slices
#' contiguous that way), so code that reads model$A / model$B keeps working.
#' @keywords internal
pmf_wrap_model <- function(py_model, tr, method, hp, l1_reg, limit_step,
                           initial_step, early_stop, reuse_prev,
                           weight_mult, nthreads) {
    A <- t(py_model$A)  # [k, dimA]
    B <- t(py_model$B)  # [k, dimB]
    model <- list(
        A = A, B = B,
        Bsum = as.numeric(py_model$Bsum),
        Amean = as.numeric(py_model$Amean),
        method = method, k = nrow(A),
        dimA = ncol(A), dimB = ncol(B),
        nnz = length(tr$vals),
        l1_reg = as.numeric(l1_reg), l2_reg = hp$l2_reg,
        niter = hp$niter, maxupd = hp$maxupd,
        limit_step = limit_step, initial_step = as.numeric(initial_step),
        early_stop = early_stop, reuse_prev = reuse_prev,
        weight_mult = as.numeric(weight_mult),
        nthreads = as.integer(nthreads),
        ptr = py_model
    )
    if (!is.null(tr$levels_A)) {
        model$levels_A <- tr$levels_A
        model$levels_B <- tr$levels_B
    }
    class(model) <- "poismf"
    model
}

#' @title Faster fit without input checks
#' @description Same contract as the reference's poismf_unsafe
#' (R/poismf.R:456-513): takes pre-allocated factor matrices A [dimA, k]
#' and B [dimB, k] plus the counts in CSR and CSC form, and fits in place
#' semantics (the returned model's factors continue from A, B).  On this
#' backend both orientations are rebuilt device-side from the CSR triplets,
#' so Xcsc is accepted for signature parity and only validated.
#' @export
poismf_unsafe <- function(A, B, Xcsr, Xcsc, k, method = "tncg",
                          l2_reg = "auto", l1_reg = 0,
                          niter = "auto", maxupd = "auto",
                          limit_step = TRUE, initial_step = 1e-7,
                          early_stop = TRUE, reuse_prev = TRUE,
                          weight_mult = 1,
                          nthreads = parallel::detectCores(),
                          handle_interrupt = TRUE) {
    hp <- pmf_auto_params(method, l2_reg, niter, maxupd, k)
    tr <- pmf_as_triplets(Xcsr)
    if (!is.null(Xcsc)) {
        trc <- pmf_as_triplets(Xcsc)
        if (length(trc$vals) != length(tr$vals))
            stop("'Xcsr' and 'Xcsc' disagree on the number of entries.")
    }
    mod <- pmf_backend()
    np <- .pmf$np
    py_model <- mod$PoisMF(
        k = as.integer(k), method = method, l2_reg = hp$l2_reg,
        l1_reg = as.numeric(l1_reg), niter = hp$niter, maxupd = hp$maxupd,
        limit_step = limit_step, initial_step = as.numeric(initial_step),
        early_stop = early_stop, reuse_prev = reuse_prev,
        weight_mult = as.numeric(weight_mult),
        handle_interrupt = handle_interrupt, reindex = FALSE,
        nthreads = as.integer(nthreads)
    )
    csr <- pmf_scipy_coo(tr)$tocsr()
    csc <- pmf_scipy_coo(tr)$tocsc()
    py_model$fit_unsafe(
        np$asarray(A, dtype = "float32"), np$asarray(B, dtype = "float32"),
        csr, csc
    )
    pmf_wrap_model(py_model, tr, method, hp, l1_reg, limit_step,
                   initial_step, early_stop, reuse_prev, weight_mult,
                   nthreads)
}

# ---------------------------------------------------------------------------
# out-of-sample factors
# ---------------------------------------------------------------------------

#' Convert a single new row's data (Matrix::dsparseVector or 2-column
#' data.frame) to 0-based (items, counts); reference input contract
#' R/poismf.R:542-636.
#' @keywords internal
pmf_single_row <- function(model, X) {
    if (("levels_B" %in% names(model)) && !is.data.frame(X))
        stop("Must pass 'X' as data.frame if model was fit to X as data.frame.")
    if (is.data.frame(X)) {
        if (ncol(X) < 2L)
            stop("'X' data.frame must have 2 columns (item, count).")
        items <- pmf_map_items(model, X[[1L]], "'X'")
        counts <- as.numeric(X[[2L]])
    } else if (inherits(X, "dsparseVector")) {
        items <- as.integer(X@i) - 1L
        counts <- as.numeric(X@x)
        if (length(X) > model$dimB)
            stop("'X' has more items than the fitted model.")
    } else {
        stop("'X' must be a data.frame or a Matrix::dsparseVector.")
    }
    if (any(counts <= 0)) stop("'X' contains non-positive counts.")
    list(items = items, counts = counts)
}

#' @title Latent factors for a single new user (always TNCG)
#' @export
factors.single <- function(model, X, l2_reg = model$l2_reg,
                           l1_reg = model$l1_reg,
                           weight_mult = model$weight_mult,
                           maxupd = max(1000L, model$maxupd)) {
    if (l2_reg < 0 || l1_reg < 0)
        stop("Regularization parameter must be positive.")
    row <- pmf_single_row(model, X)
    out <- model$ptr$predict_factors(
        reticulate::tuple(as.integer(row$items), row$counts),
        l2_reg = as.numeric(l2_reg), l1_reg = as.numeric(l1_reg),
        weight_mult = as.numeric(weight_mult), maxupd = as.integer(maxupd)
    )
    as.numeric(out)
}

#' @title Latent factors for a batch of new users (training method)
#' @export
factors <- function(model, X, add_names = TRUE,
                    nthreads = parallel::detectCores()) {
    if (("levels_A" %in% names(model)) && !is.data.frame(X))
        stop("Must pass 'X' as data.frame if model was fit to X as data.frame.")
    if (is.data.frame(X)) {
        if (ncol(X) < 3L)
            stop("'X' data.frame must have 3 columns (user, item, count).")
        # build the CSR directly with SORTED-level row codes so output row i
        # corresponds to levels(fA)[i], the reference's row order
        # (R/poismf.R:643-659) — the Python DataFrame path would order rows
        # by first appearance instead
        fA <- factor(X[[1L]])
        items <- pmf_map_items(model, X[[2L]], "'X'")
        tr <- list(ix_row = as.integer(fA) - 1L, ix_col = items,
                   vals = as.numeric(X[[3L]]),
                   dimA = nlevels(fA), dimB = model$dimB)
        A_new <- model$ptr$transform(pmf_scipy_coo(tr)$tocsr())
        if (add_names) row.names(A_new) <- levels(fA)
    } else {
        tr <- pmf_as_triplets(X)
        if (tr$dimB > model$dimB)
            stop("'X' must have the same columns (items) as passed to 'poismf'.")
        tr$dimB <- model$dimB
        A_new <- model$ptr$transform(pmf_scipy_coo(tr)$tocsr())
    }
    A_new
}

# ---------------------------------------------------------------------------
# id mapping helpers (1-based / levels <-> 0-based)
# ---------------------------------------------------------------------------

#' @keywords internal
pmf_map_users <- function(model, users, errname = "'user'") {
    if (is.null(users) || !NROW(users)) return(integer(0))
    if ("levels_A" %in% names(model)) {
        ix <- match(as.character(users), model$levels_A)
        if (any(is.na(ix)))
            stop(sprintf("%s contains IDs not present in the model.", errname))
        return(as.integer(ix) - 1L)
    }
    ix <- as.integer(users)
    if (any(is.na(ix)) || any(ix < 1L) || any(ix > model$dimA))
        stop(sprintf("%s contains invalid row numbers.", errname))
    ix - 1L
}

#' @keywords internal
pmf_map_items <- function(model, items, errname = "'item'") {
    if (is.null(items) || !NROW(items)) return(integer(0))
    if ("levels_B" %in% names(model)) {
        ix <- match(as.character(items), model$levels_B)
        if (any(is.na(ix)))
            stop(sprintf("%s contains IDs not present in the model.", errname))
        return(as.integer(ix) - 1L)
    }
    ix <- as.integer(items)
    if (any(is.na(ix)) || any(ix < 1L) || any(ix > model$dimB))
        stop(sprintf("%s contains invalid column numbers.", errname))
    ix - 1L
}

# ---------------------------------------------------------------------------
# prediction / ranking
# ---------------------------------------------------------------------------

#' @title Predict expected counts for user/item pairs
#' @description Vector form: predict(model, a, b) with equal-length user and
#' item vectors.  Sparse form: predict(model, a) with 'a' a dgTMatrix whose
#' pattern selects the (row, col) pairs; returns the same matrix with @x
#' replaced by the predictions (R/poismf.R:732-775).
#' @export
predict.poismf <- function(object, a, b = NULL,
                           nthreads = parallel::detectCores(), ...) {
    if (is.null(a)) stop("Must pass 'a'.")
    if (is.null(b)) {
        if ("levels_A" %in% names(object))
            stop("Must pass 'b' when fitting the model was fit to a data.frame.")
        if (is.data.frame(a)) stop("Cannot pass a data.frame as 'a'.")
        if (!inherits(a, "TsparseMatrix"))
            a <- methods::as(a, "TsparseMatrix")
        ixA <- a@i
        ixB <- a@j
        pred <- as.numeric(object$ptr$predict(as.integer(ixA),
                                              as.integer(ixB)))
        a@x <- pred
        return(a)
    }
    ixA <- pmf_map_users(object, a, "'a'")
    ixB <- pmf_map_items(object, b, "'b'")
    if (length(ixA) != length(ixB))
        stop("'a' and 'b' must have the same number of entries.")
    as.numeric(object$ptr$predict(as.integer(ixA), as.integer(ixB)))
}

#' Shared include/exclude validation + backend call + 1-based/levels remap
#' of the output (reference topN_internal, R/poismf.R:807-845).
#' @keywords internal
pmf_topn_internal <- function(model, py_call, n, include, exclude,
                              output_score) {
    if (!is.null(include) && !is.null(exclude))
        stop("Can only pass one of 'include' or 'exclude'.")
    if (NROW(n) != 1L) stop("'n' must be a positive integer.")
    if (NROW(output_score) != 1L)
        stop("'output_score' must be a single logical/boolean.")
    if (n > model$dimB)
        stop("'n' is larger than the available number of items.")
    inc <- pmf_map_items(model, include, "'include'")
    exc <- pmf_map_items(model, exclude, "'exclude'")
    if (NROW(inc) > 0L && n < NROW(inc))
        stop("'n' cannot be smaller than the number of entries in 'include'.")
    if (NROW(exc) > 0L && n > (model$dimB - NROW(exc)))
        stop("'n' is larger than the available number of items.")
    res <- py_call(as.integer(n),
                   if (NROW(inc)) as.integer(inc) else NULL,
                   if (NROW(exc)) as.integer(exc) else NULL,
                   as.logical(output_score))
    if (output_score) {
        ix <- as.integer(res[[1L]]) + 1L
        score <- as.numeric(res[[2L]])
    } else {
        ix <- as.integer(res) + 1L
    }
    if ("levels_B" %in% names(model)) ix <- model$levels_B[ix]
    if (output_score) list(ix = ix, score = score) else ix
}

#' @title Rank top-N highest-predicted items for an existing user
#' @export
topN <- function(model, user, n = 10, include = NULL, exclude = NULL,
                 output_score = FALSE, nthreads = parallel::detectCores()) {
    if (NROW(user) != 1L) stop("'user' must be a single ID or row number.")
    u <- pmf_map_users(model, user, "'user'")
    pmf_topn_internal(
        model,
        function(n, inc, exc, os)
            model$ptr$topN(as.integer(u), n = n, include = inc,
                           exclude = exc, output_score = os),
        n, include, exclude, output_score
    )
}

#' @title Rank top-N highest-predicted items for a new user
#' @export
topN.new <- function(model, X, n = 10, include = NULL, exclude = NULL,
                     output_score = FALSE,
                     l2_reg = model$l2_reg, l1_reg = model$l1_reg,
                     weight_mult = model$weight_mult,
                     maxupd = max(1000L, model$maxupd),
                     nthreads = parallel::detectCores()) {
    row <- pmf_single_row(model, X)
    pmf_topn_internal(
        model,
        function(n, inc, exc, os)
            model$ptr$topN_new(
                reticulate::tuple(as.integer(row$items), row$counts),
                n = n, include = inc, exclude = exc, output_score = os,
                l2_reg = as.numeric(l2_reg), l1_reg = as.numeric(l1_reg),
                weight_mult = as.numeric(weight_mult),
                maxupd = as.integer(maxupd)
            ),
        n, include, exclude, output_score
    )
}

# ---------------------------------------------------------------------------
# introspection (contracts from R/poismf.R:953-1039)
# ---------------------------------------------------------------------------

#' @title Get information about poismf object
#' @export
print.poismf <- function(x, ...) {
    cat("Poisson Matrix Factorization (TPU backend)\n\n")
    cat(sprintf("Method: %s\n", x$method))
    cat(sprintf("Number of rows: %d\n", x$dimA))
    cat(sprintf("Number of columns: %d\n", x$dimB))
    cat(sprintf("Number of non-zero entries: %d\n", x$nnz))
    cat(sprintf("Dimensionality of factorization: %d\n", x$k))
    cat(sprintf("L1 regularization :%g - L2 regularization: %g\n",
                x$l1_reg, x$l2_reg))
    cat(sprintf("Iterations: %d - max upd. per iter: %d\n",
                x$niter, x$maxupd))
    cat("\n")
    if ("levels_A" %in% names(x)) {
        cat("\nRow names:", head(x$levels_A),
            ifelse(NROW(x$levels_A) > 6L, "...", ""))
        cat("\nCol names:", head(x$levels_B),
            ifelse(NROW(x$levels_B) > 6L, "...", ""), "\n")
    }
}

#' @title Get information about poismf object
#' @export
summary.poismf <- function(object, ...) {
    print.poismf(object)
}

#' @title Extract Latent Factor Matrices
#' @description Returns list(A, B) with the factors in [dim, k] orientation;
#' row names added from the data.frame levels when add_names=TRUE.
#' @export
get.factor.matrices <- function(model, add_names = TRUE) {
    A <- t(model$A)
    B <- t(model$B)
    if (add_names && ("levels_A" %in% names(model))) {
        row.names(A) <- model$levels_A
        row.names(B) <- model$levels_B
    }
    list(A = A, B = B)
}

#' @title Extract user/row and item/column mappings
#' @export
get.model.mappings <- function(model) {
    if (!("poismf" %in% class(model)))
        stop("Must pass a 'poismf' model object.")
    if ("levels_A" %in% names(model))
        list(rows = model$levels_A, columns = model$levels_B)
    else
        list(rows = NULL, columns = NULL)
}
